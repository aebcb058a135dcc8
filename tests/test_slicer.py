"""Tests for the land-parcel slicing engine.

Expectations derived by hand-walking the reference decision tree
(khrylib/utils/shapely.py) on simple blocks.
"""
import numpy as np
import pytest

from urban_tpu.geometry import ops
from urban_tpu.geometry.base import Geometry
from urban_tpu.geometry import slicer


# business-like constraints (meters), cell_edge_length=1
BUSINESS = dict(cell_edge_length=1.0, min_edge_length=100.0, max_edge_length=200.0,
                search_max_length=280.0, search_max_area=20000.0,
                search_min_area=10000.0)


def _corners(ring):
    return np.asarray(ring, dtype=float)


def test_corner_slice_small_square_uses_whole():
    # 100x100 block, corner intersection: L-shape path ends in a U-shape
    # envelope covering the entire block
    block = Geometry.polygon([[0, 0], [100, 0], [100, 100], [0, 100]])
    inters = _corners([[0, 0], [100, 0], [100, 100], [0, 100]])
    parcel = slicer.slice_polygon(block, [0, 0], inters, **BUSINESS)
    assert parcel.area == pytest.approx(100 * 100)


def test_mid_edge_slice_long_block():
    # 300x100 block, intersection mid bottom edge: expect the 200x100 end cut
    # ending at the max edge length (hand-walk of the whole-edge path)
    block = Geometry.polygon([[0, 0], [300, 0], [300, 100], [0, 100]])
    inters = _corners([[0, 0], [300, 0], [300, 100], [0, 100], [150, 0]])
    parcel = slicer.slice_polygon(block, [150, 0], inters, **BUSINESS)
    assert parcel.area == pytest.approx(200 * 100)
    x0, y0, x1, y1 = parcel.bounds
    assert (x1 - x0) == pytest.approx(200.0)
    assert (y1 - y0) == pytest.approx(100.0)


def test_corner_slice_large_square_respects_max_edge():
    # 400x400 block, corner intersection: both corner edges are longer than the
    # search length, so both get truncated at max_edge_length -> 200x200 cut
    block = Geometry.polygon([[0, 0], [400, 0], [400, 400], [0, 400]])
    inters = _corners([[0, 0], [400, 0], [400, 400], [0, 400]])
    parcel = slicer.slice_polygon(block, [0, 0], inters, **BUSINESS)
    assert parcel.area == pytest.approx(200 * 200)
    assert parcel.bounds == pytest.approx((0, 0, 200, 200))


def test_slice_prefers_existing_intersection():
    # an intersection at 150 on the corner edge within [min,max] edge length is
    # used as the cut end instead of the raw max length
    block = Geometry.polygon([[0, 0], [400, 0], [400, 400], [0, 400]])
    inters = _corners([[0, 0], [400, 0], [400, 400], [0, 400], [150, 0], [0, 150]])
    parcel = slicer.slice_polygon(block, [0, 0], inters, **BUSINESS)
    assert parcel.bounds == pytest.approx((0, 0, 150, 150))


def test_concave_corner_part_edge():
    # reflex corner of an L-shaped block routes to the part-edge sweep and
    # still produces a parcel inside the block
    block = Geometry.polygon([[0, 0], [1000, 0], [1000, 400], [400, 400],
                              [400, 1000], [0, 1000]])
    inters = _corners(block.coords)
    parcel = slicer.slice_polygon(block, [400, 400], inters, **BUSINESS)
    assert parcel.area > 0
    # parcel stays within the block
    for p in parcel.coords:
        assert ops.point_in_ring(p, block.coords) >= 0


def test_interval_angle_classification():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    assert slicer.check_interval_angle(square, [0, 0], [10, 0], [0, 10], 1e-4) == 'convex'
    l_ring = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], dtype=float)
    assert slicer.check_interval_angle(l_ring, [4, 4], [10, 4], [4, 10], 1e-4) == 'concave'


def test_slice_edge_whole_and_substring():
    inters = np.zeros((0, 2))
    edge = (np.array([0.0, 0.0]), np.array([100.0, 0.0]))
    sliced, whole = slicer.slice_edge(edge, [0, 0], inters, 1e-4, 1.0,
                                      100.0, 200.0, 280.0)
    assert whole
    edge = (np.array([0.0, 0.0]), np.array([500.0, 0.0]))
    sliced, whole = slicer.slice_edge(edge, [0, 0], inters, 1e-4, 1.0,
                                      100.0, 200.0, 280.0)
    assert not whole
    assert np.allclose(sliced[1], [200.0, 0.0])


def test_grid_units_scaling():
    # same 300x100 m case but in 10 m grid units (synthetic grid scenario)
    spec = dict(BUSINESS)
    spec['cell_edge_length'] = 10.0
    spec['search_max_area'] = 20000.0
    spec['search_min_area'] = 10000.0
    block = Geometry.polygon([[0, 0], [30, 0], [30, 10], [0, 10]])
    inters = _corners([[0, 0], [30, 0], [30, 10], [0, 10], [15, 0]])
    parcel = slicer.slice_polygon(block, [15, 0], inters, **spec)
    assert parcel.area * 100.0 == pytest.approx(20000.0)
