"""Differential tests: jit fixed-buffer geometry vs the exact host kernel."""
import numpy as np
import jax.numpy as jnp
import pytest

from urban_tpu.geometry import ops
from urban_tpu.jaxenv import geometry as jg

KV = 16


def pad_ring(ring, kv=KV):
    ring = np.asarray(ring, dtype=np.float64)
    out = np.zeros((kv, 2))
    out[:len(ring)] = ring
    return jnp.asarray(out), jnp.asarray(len(ring))


SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
L_SHAPE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [4.0, 4.0],
                    [4.0, 10.0], [0.0, 10.0]])


def test_ring_measures():
    for ring in (SQUARE, L_SHAPE):
        r, n = pad_ring(ring)
        assert float(jg.ring_area(r, n)) == pytest.approx(
            ops.ring_area(ring))
        host_centroid = __import__(
            'urban_tpu.geometry.base', fromlist=['Geometry']
        ).Geometry.polygon(ring).centroid
        assert np.asarray(jg.ring_centroid(r, n)) == pytest.approx(
            host_centroid)
        b = np.asarray(jg.ring_bounds(r, n))
        assert b == pytest.approx([ring[:, 0].min(), ring[:, 1].min(),
                                   ring[:, 0].max(), ring[:, 1].max()])


def test_point_in_ring():
    r, n = pad_ring(L_SHAPE)
    assert bool(jg.point_in_ring(jnp.array([2.0, 2.0]), r, n))
    assert not bool(jg.point_in_ring(jnp.array([8.0, 8.0]), r, n))


def test_halfplane_clip_matches_host():
    r, n = pad_ring(SQUARE)
    out, nv, ovf = jg.halfplane_clip_ring(r, n, jnp.array([4.0, -1.0]),
                                          jnp.array([4.0, 11.0]), True)
    assert not bool(ovf)
    area = float(jg.ring_area(out, nv))
    host = ops.halfplane_clip(SQUARE, np.array([4.0, -1.0]),
                              np.array([4.0, 11.0]), True)
    assert area == pytest.approx(sum(ops.ring_area(p) for p in host))


def test_clip_by_quad_matches_host():
    quad = np.array([[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0]])
    for ring in (SQUARE, L_SHAPE):
        r, n = pad_ring(ring)
        out, nv, ovf = jg.clip_poly_by_convex_quad(r, n, jnp.asarray(quad))
        assert not bool(ovf)
        host = ops.clip_polygon_convex(ring, quad)
        assert float(jg.ring_area(out, nv)) == pytest.approx(
            sum(ops.ring_area(p) for p in host), abs=1e-6)


def test_difference_by_quad_matches_host():
    quad = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    r, n = pad_ring(SQUARE)
    pieces, counts, ovf = jg.difference_pieces_by_quad(r, n, jnp.asarray(quad))
    assert not bool(ovf)
    total = sum(float(jg.ring_area(pieces[i], counts[i])) for i in range(4))
    host = ops.difference_convex(SQUARE, quad)
    assert total == pytest.approx(sum(ops.ring_area(p) for p in host))


def test_oriented_rect():
    rect = np.asarray(jg.oriented_rect(jnp.array([0.0, 0.0]),
                                       jnp.array([10.0, 0.0]),
                                       jnp.asarray(3.0)))
    assert ops.ring_area(rect) == pytest.approx(30.0)
    host = ops.single_sided_buffer(np.array([0.0, 0.0]),
                                   np.array([10.0, 0.0]), 3.0)
    assert ops.ring_area(rect) == pytest.approx(ops.ring_area(host))


def test_dedupe_ring():
    ring = np.array([[0, 0], [0, 0], [10, 0], [10, 10], [10, 10], [0, 10]],
                    dtype=float)
    r, n = pad_ring(ring)
    out, nv = jg.dedupe_ring(r, n)
    assert int(nv) == 4
    assert float(jg.ring_area(out, nv)) == pytest.approx(100.0)


def test_dedupe_ring_wraparound_closure():
    # A raw f32 arc walk can re-emit the start crossing as the final
    # vertex with ~ulp noise; the host oracle (geometry/ops.py dedupe_ring)
    # drops that closing duplicate, and the jit tier must too — otherwise
    # the vertex COUNT differs and DP simplification anchors diverge.
    eps = 1e-8
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [eps, eps]],
                    dtype=float)
    r, n = pad_ring(ring)
    out, nv = jg.dedupe_ring(r, n)
    assert int(nv) == 4
    assert float(jg.ring_area(out, nv)) == pytest.approx(100.0)
    # a RUN of trailing wrap-duplicates collapses too
    ring2 = np.array([[0, 0], [10, 0], [10, 10], [0, 10],
                      [eps, 0.0], [0.0, eps]], dtype=float)
    r2, n2 = pad_ring(ring2)
    out2, nv2 = jg.dedupe_ring(r2, n2)
    assert int(nv2) == 4
    # a near-duplicate of vertex 0 MID-ring (followed by distinct vertices)
    # is not a wraparound closure and must survive
    ring3 = np.array([[0, 0], [10, 0], [eps, eps], [0, 10]], dtype=float)
    r3, n3 = pad_ring(ring3)
    out3, nv3 = jg.dedupe_ring(r3, n3)
    assert int(nv3) == 4
    np.testing.assert_allclose(np.asarray(out3[2]), [eps, eps])
    # trailing drift chain: the penultimate vertex is a consecutive dup of
    # the last (dropped by compaction) and the survivor is a wrap-duplicate
    # of vertex 0 — the host compacts FIRST, then trims (ops.py:227-229),
    # so both go; the dropped dup must not break the suffix run
    tol = 1e-7
    ring4 = np.array([[0, 0], [10, 0], [10, 10], [0, 10],
                      [0.8 * tol, 0], [1.6 * tol, 0]], dtype=float)
    r4, n4 = pad_ring(ring4)
    out4, nv4 = jg.dedupe_ring(r4, n4)
    assert int(nv4) == 4
    host4 = ops.dedupe_ring(ring4, tol)
    assert len(host4) == 4
