"""Unit tests for the exact host geometry kernel."""
import math

import numpy as np
import pytest

from urban_tpu.geometry import ops
from urban_tpu.geometry.base import Geometry
from urban_tpu.geometry.metrics import shape_metrics
from urban_tpu.geometry import graph as ggraph


SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
L_SHAPE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [4.0, 4.0],
                    [4.0, 10.0], [0.0, 10.0]])
U_SHAPE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [7.0, 10.0],
                    [7.0, 3.0], [3.0, 3.0], [3.0, 10.0], [0.0, 10.0]])


def test_ring_area_and_centroid():
    sq = Geometry.polygon(SQUARE)
    assert sq.area == pytest.approx(100.0)
    assert sq.centroid == pytest.approx([5.0, 5.0])
    l = Geometry.polygon(L_SHAPE)
    assert l.area == pytest.approx(10 * 4 + 4 * 6)


def test_point_in_ring():
    assert ops.point_in_ring([5, 5], SQUARE) == 1
    assert ops.point_in_ring([5, 0], SQUARE) == 0
    assert ops.point_in_ring([15, 5], SQUARE) == -1
    assert ops.point_in_ring([8, 8], U_SHAPE) == 1
    assert ops.point_in_ring([5, 8], U_SHAPE) == -1  # in the notch


def test_clip_convex_square():
    clipper = np.array([[5.0, -1.0], [11.0, -1.0], [11.0, 11.0], [5.0, 11.0]])
    pieces = ops.clip_polygon_convex(SQUARE, clipper)
    assert len(pieces) == 1
    assert ops.ring_area(pieces[0]) == pytest.approx(50.0)


def test_clip_convex_splits_u_shape():
    # clip the top band of a U: two disjoint prongs
    clipper = np.array([[-1.0, 5.0], [11.0, 5.0], [11.0, 11.0], [-1.0, 11.0]])
    pieces = ops.clip_polygon_convex(U_SHAPE, clipper)
    areas = sorted(ops.ring_area(p) for p in pieces)
    assert len(pieces) == 2
    assert areas == pytest.approx([15.0, 15.0])


def test_difference_convex():
    cutter = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    pieces = ops.difference_convex(SQUARE, cutter)
    total = sum(ops.ring_area(p) for p in pieces)
    assert total == pytest.approx(100.0 - 16.0)
    # the remaining L should merge into a single piece like GEOS difference
    assert len(pieces) == 1


def test_difference_convex_splitting():
    # cutting a middle band out of the square leaves two pieces
    cutter = np.array([[-1.0, 4.0], [11.0, 4.0], [11.0, 6.0], [-1.0, 6.0]])
    pieces = ops.difference_convex(SQUARE, cutter)
    areas = sorted(ops.ring_area(p) for p in pieces)
    assert areas == pytest.approx([40.0, 40.0])


def test_convex_hull_and_mrr():
    pts = np.array([[0, 0], [4, 0], [4, 2], [0, 2], [2, 1]], dtype=float)
    hull = ops.convex_hull(pts)
    assert ops.ring_area(hull) == pytest.approx(8.0)
    mrr = ops.min_rotated_rect(pts)
    assert ops.ring_area(mrr) == pytest.approx(8.0)
    # rotated case
    rot = np.array([[0, 0], [3, 3], [2, 4], [-1, 1]], dtype=float)
    mrr = ops.min_rotated_rect(rot)
    assert ops.ring_area(mrr) == pytest.approx(ops.ring_area(rot), rel=1e-6)


def test_single_sided_buffer():
    rect = ops.single_sided_buffer(np.array([0.0, 0.0]), np.array([10.0, 0.0]), 3.0)
    assert ops.ring_area(rect) == pytest.approx(30.0)
    assert rect[:, 1].max() == pytest.approx(3.0)
    rect_r = ops.single_sided_buffer(np.array([0.0, 0.0]), np.array([10.0, 0.0]), -3.0)
    assert rect_r[:, 1].min() == pytest.approx(-3.0)


def test_snap_geometry_moves_and_inserts():
    poly = Geometry.polygon(SQUARE)
    targets = np.array([[0.05, 0.0], [5.0, 0.0]])
    snapped = ops.snap_geometry(poly, targets, tol=0.1)
    # vertex (0,0) moved onto target, and (5,0) inserted on the bottom edge
    assert any(np.allclose(c, [0.05, 0.0]) for c in snapped.coords)
    assert any(np.allclose(c, [5.0, 0.0]) for c in snapped.coords)


def test_simplify_by_angle():
    ring = np.array([[0, 0], [5, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    out = ops.simplify_ring_by_angle(ring, deg_tol=1.0)
    assert len(out) == 4
    assert ops.ring_area(out) == pytest.approx(100.0)


def test_simplify_by_distance():
    ring = np.array([[0, 0], [10, 0], [10.0005, 0.0005], [10, 10], [0, 10]])
    out = ops.simplify_ring_by_distance(ring, distance_tol=0.01)
    assert len(out) == 4


def test_geometry_distance_and_intersects():
    p = Geometry.point(5, 5)
    sq = Geometry.polygon(SQUARE)
    assert ops.geometry_distance(p, sq) == 0.0
    far = Geometry.point(20, 5)
    assert ops.geometry_distance(far, sq) == pytest.approx(10.0)
    line = Geometry.line([[10, 0], [20, 0]])
    assert ops.geometries_intersect(line, sq, tol=1e-6)
    line2 = Geometry.line([[10.5, 0], [20, 0]])
    assert not ops.geometries_intersect(line2, sq, tol=1e-6)


def test_shape_metrics_square():
    sq = Geometry.polygon(SQUARE)
    rect, eqi, sc = shape_metrics(sq)
    assert rect == pytest.approx(1.0)
    assert eqi == pytest.approx(1.0)
    assert sc == pytest.approx(1.0)
    l = Geometry.polygon(L_SHAPE)
    rect_l, _, sc_l = shape_metrics(l)
    assert rect_l == pytest.approx(64.0 / 100.0)
    assert sc_l < 1.0


def test_connected_components_and_degrees():
    segs = [np.array([[0, 0], [1, 0]]), np.array([[1, 0], [2, 0]]),
            np.array([[5, 5], [6, 5]])]
    nodes, edges, _ = ggraph.segment_graph(segs)
    assert ggraph.connected_components(len(nodes), edges) == 2
    deg = ggraph.node_degrees(len(nodes), edges)
    assert sorted(deg.tolist()) == [1, 1, 1, 1, 2]


def test_merge_false_nodes():
    segs = [np.array([[0, 0], [1, 0]]), np.array([[1, 0], [2, 0]]),
            np.array([[2, 0], [2, 1]])]
    lengths = ggraph.merge_false_nodes(segs)
    # degree-2 chain: all three merge into one road of length 3
    assert lengths == pytest.approx([3.0])


def test_polygonize_grid():
    # a 2x1 grid of unit squares: 2 bounded faces. Input linework must be
    # noded, as for shapely.ops.polygonize (plan roads are noded by
    # construction in the simulator).
    segs = [
        np.array([[0, 0], [1, 0]]), np.array([[1, 0], [2, 0]]),
        np.array([[0, 1], [1, 1]]), np.array([[1, 1], [2, 1]]),
        np.array([[0, 0], [0, 1]]), np.array([[1, 0], [1, 1]]),
        np.array([[2, 0], [2, 1]]),
    ]
    faces = ggraph.polygonize(segs)
    areas = sorted(ops.ring_area(f) for f in faces)
    assert areas == pytest.approx([1.0, 1.0])
