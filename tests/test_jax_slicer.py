"""Branch-kernel tests for the jitted slicer (urban_tpu/jaxenv/slicer.py).

Two independent anchors per tail branch of the reference decision tree
(reference khrylib/utils/shapely.py:203-343,386-630):

1. HAND-COMPUTED fixtures — expectations derived by walking the reference
   pseudocode on paper (the reflection/doubling loops of
   slice_from_angle_rect_tri and slice_from_u_shape, and the deep/shallow
   probe decision of slice_from_part_edge), asserted on BOTH the host
   oracle (urban_tpu/geometry/slicer.py) and the jit kernels. These do not
   depend on either implementation being correct.
2. DIFFERENTIAL sweeps — parameter grids (kept away from branch-decision
   thresholds, see the f32/FMA notes in jaxenv/slicer.py) where host and
   jit must agree on the resulting cut envelope.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from urban_tpu.geometry import slicer as hsl
from urban_tpu.jaxenv import slicer as jsl
from urban_tpu.jaxenv.slicer import LuParams

EPS = 1e-4


def _lp(cell=1.0, min_edge=100.0, max_edge=200.0, search_max_length=280.0,
        search_max_area=20000.0, search_min_area=10000.0):
    return LuParams(
        cell=jnp.float32(cell), min_edge=jnp.float32(min_edge),
        max_edge=jnp.float32(max_edge),
        search_max_length=jnp.float32(search_max_length),
        search_max_area=jnp.float32(search_max_area),
        search_min_area=jnp.float32(search_min_area),
        common_min_edge=jnp.float32(search_max_length - max_edge))


def _bounds(quad):
    q = np.asarray(quad, dtype=np.float64)
    return (q[:, 0].min(), q[:, 1].min(), q[:, 0].max(), q[:, 1].max())


def _pad_ring(ring, kv=16):
    ring = np.asarray(ring, dtype=np.float32)
    nv = len(ring)
    out = np.zeros((kv, 2), dtype=np.float32)
    out[:nv] = ring
    return jnp.asarray(out), jnp.asarray(nv)


# ---------------------------------------------------------------------------
# rect-tri shrink loop (reference shapely.py:289-340)
# ---------------------------------------------------------------------------

def test_rect_tri_shrink_two_doublings_hand():
    # edge_1 horizontal (0,0)-(100,0); edge_2 slanted to p_2=(30,40).
    # angle(p_1-p_c, p_2-p_c) = 53.13 deg <= 60 -> shrink path.
    # foot(p_2)=(30,0), d(foot,p_1)=70 in (eps, 80) -> double: p_2=(60,80)
    # foot=(60,0), d=40 in (eps, 80)               -> double: p_2=(120,160)
    # foot clamps to (100,0), d=0                  -> stop
    # envelope of (0,0),(100,0),(120,160) = (0,0,120,160)
    p_c, p_1, p_2 = (np.array([0.0, 0.0]), np.array([100.0, 0.0]),
                     np.array([30.0, 40.0]))
    host = hsl.slice_from_angle_rect_tri(
        (p_c, p_1), (p_c, p_2), p_c, p_1, p_2, EPS, thres_dis=80.0)
    assert _bounds(host) == pytest.approx((0, 0, 120, 160))
    jit = jsl.rect_tri_cut(jnp.asarray(p_c), jnp.asarray(p_1),
                           jnp.asarray(p_2), jnp.float32(80.0), _lp())
    assert _bounds(jit) == pytest.approx((0, 0, 120, 160), abs=1e-2)


def test_rect_tri_shrink_stops_beyond_thres_hand():
    # same geometry, thres_dis=50: d(foot,p_1)=70 >= 50 -> loop never runs,
    # envelope of the raw triangle corners = (0,0,100,40)
    p_c, p_1, p_2 = (np.array([0.0, 0.0]), np.array([100.0, 0.0]),
                     np.array([30.0, 40.0]))
    host = hsl.slice_from_angle_rect_tri(
        (p_c, p_1), (p_c, p_2), p_c, p_1, p_2, EPS, thres_dis=50.0)
    assert _bounds(host) == pytest.approx((0, 0, 100, 40))
    jit = jsl.rect_tri_cut(jnp.asarray(p_c), jnp.asarray(p_1),
                           jnp.asarray(p_2), jnp.float32(50.0), _lp())
    assert _bounds(jit) == pytest.approx((0, 0, 100, 40), abs=1e-2)


def test_rect_tri_wide_angle_envelope_hand():
    # angle = 81.5 deg > 60 -> plain envelope, no shrinking
    p_c, p_1, p_2 = (np.array([0.0, 0.0]), np.array([100.0, 0.0]),
                     np.array([30.0, 200.0]))
    host = hsl.slice_from_angle_rect_tri(
        (p_c, p_1), (p_c, p_2), p_c, p_1, p_2, EPS, thres_dis=80.0)
    assert _bounds(host) == pytest.approx((0, 0, 100, 200))
    jit = jsl.rect_tri_cut(jnp.asarray(p_c), jnp.asarray(p_1),
                           jnp.asarray(p_2), jnp.float32(80.0), _lp())
    assert _bounds(jit) == pytest.approx((0, 0, 100, 200), abs=1e-2)


def test_rect_tri_no_hv_parallelogram_mrr_hand():
    # neither edge axis-aligned -> MRR of the parallelogram
    # (0,0),(30,40),(-10,70),(-40,30): a perfect rotated square, area 2500
    p_c, p_1, p_2 = (np.array([0.0, 0.0]), np.array([30.0, 40.0]),
                     np.array([-40.0, 30.0]))
    host = hsl.slice_from_angle_rect_tri(
        (p_c, p_1), (p_c, p_2), p_c, p_1, p_2, EPS, thres_dis=80.0)
    hq = np.asarray(host, dtype=np.float64)[:4]
    area = 0.5 * abs(np.sum(hq[:, 0] * np.roll(hq[:, 1], -1)
                            - np.roll(hq[:, 0], -1) * hq[:, 1]))
    assert area == pytest.approx(2500.0, rel=1e-6)
    assert _bounds(host) == pytest.approx((-40, 0, 30, 70))
    jit = jsl.rect_tri_cut(jnp.asarray(p_c), jnp.asarray(p_1),
                           jnp.asarray(p_2), jnp.float32(80.0), _lp())
    jq = np.asarray(jit, dtype=np.float64)
    jarea = 0.5 * abs(np.sum(jq[:, 0] * np.roll(jq[:, 1], -1)
                             - np.roll(jq[:, 0], -1) * jq[:, 1]))
    assert jarea == pytest.approx(2500.0, rel=1e-3)
    assert _bounds(jit) == pytest.approx((-40, 0, 30, 70), abs=1e-2)


def test_rect_tri_both_hv_envelope_hand():
    p_c, p_1, p_2 = (np.array([0.0, 0.0]), np.array([120.0, 0.0]),
                     np.array([0.0, 90.0]))
    host = hsl.slice_from_angle_rect_tri(
        (p_c, p_1), (p_c, p_2), p_c, p_1, p_2, EPS, thres_dis=80.0)
    assert _bounds(host) == pytest.approx((0, 0, 120, 90))
    jit = jsl.rect_tri_cut(jnp.asarray(p_c), jnp.asarray(p_1),
                           jnp.asarray(p_2), jnp.float32(80.0), _lp())
    assert _bounds(jit) == pytest.approx((0, 0, 120, 90), abs=1e-2)


def test_rect_tri_differential_sweep():
    # p_1 on the x-axis (edge_1 HV), p_2 swept over radii/angles chosen to
    # stay away from the 60-degree and thres_dis decision boundaries
    lp = _lp()
    for l1 in (80.0, 140.0):
        for r in (40.0, 70.0, 110.0):
            for deg in (20.0, 35.0, 50.0, 70.0, 85.0):
                th = np.radians(deg)
                p_c = np.array([0.0, 0.0])
                p_1 = np.array([l1, 0.0])
                p_2 = np.array([r * np.cos(th), r * np.sin(th)])
                for thres in (30.0, 90.0):
                    host = hsl.slice_from_angle_rect_tri(
                        (p_c, p_1), (p_c, p_2), p_c, p_1, p_2, EPS,
                        thres_dis=thres)
                    jit = jsl.rect_tri_cut(
                        jnp.asarray(p_c, jnp.float32),
                        jnp.asarray(p_1, jnp.float32),
                        jnp.asarray(p_2, jnp.float32),
                        jnp.float32(thres), lp)
                    hb, jb = _bounds(host), _bounds(jit)
                    assert jb == pytest.approx(hb, abs=0.05), \
                        (l1, r, deg, thres, hb, jb)


# ---------------------------------------------------------------------------
# U-shape refinement loop (reference shapely.py:203-257)
# ---------------------------------------------------------------------------

def test_u_shape_refinement_two_doublings_hand():
    # edge_c=(0,0)-(100,0) HV, edge_1=(0,0)-(0,80) HV, edge_2 slanted to
    # p_2=(140,30). angle((40,30),(-100,0)) = 143.1 deg <= 150 -> refine.
    # foot(p_2 on edge_1)=(0,30), d(foot,p_1)=50 -> double: p_2=(180,60)
    # foot=(0,60), d=20 -> double: p_2=(260,120); foot clamps to (0,80),
    # d=0 -> stop. envelope = (0,0,260,120)
    edge_c = (np.array([0.0, 0.0]), np.array([100.0, 0.0]))
    edge_1 = (np.array([0.0, 0.0]), np.array([0.0, 80.0]))
    edge_2 = (np.array([100.0, 0.0]), np.array([140.0, 30.0]))
    host = hsl.slice_from_u_shape(edge_c, edge_1, edge_2, EPS)
    assert _bounds(host) == pytest.approx((0, 0, 260, 120))
    jit = jsl.u_shape_cut(jnp.asarray([0.0, 0.0]), jnp.asarray([100.0, 0.0]),
                          jnp.asarray([0.0, 80.0]), jnp.asarray([140.0, 30.0]),
                          _lp())
    assert _bounds(jit) == pytest.approx((0, 0, 260, 120), abs=1e-2)


def test_u_shape_wide_angle_envelope_hand():
    # p_2=(160,10): angle((60,10),(-100,0)) = 170.5 deg > 150 -> plain
    # envelope of all six edge endpoints = (0,0,160,80)
    edge_c = (np.array([0.0, 0.0]), np.array([100.0, 0.0]))
    edge_1 = (np.array([0.0, 0.0]), np.array([0.0, 80.0]))
    edge_2 = (np.array([100.0, 0.0]), np.array([160.0, 10.0]))
    host = hsl.slice_from_u_shape(edge_c, edge_1, edge_2, EPS)
    assert _bounds(host) == pytest.approx((0, 0, 160, 80))
    jit = jsl.u_shape_cut(jnp.asarray([0.0, 0.0]), jnp.asarray([100.0, 0.0]),
                          jnp.asarray([0.0, 80.0]), jnp.asarray([160.0, 10.0]),
                          _lp())
    assert _bounds(jit) == pytest.approx((0, 0, 160, 80), abs=1e-2)


def test_u_shape_differential_sweep():
    # edge_c along x, edge_1 vertical (HV), edge_2 endpoint swept
    lp = _lp()
    for w in (100.0, 160.0):
        for h1 in (60.0, 120.0):
            for dx in (20.0, 60.0, 90.0):
                for dy in (15.0, 45.0, 80.0):
                    edge_c = (np.array([0.0, 0.0]), np.array([w, 0.0]))
                    edge_1 = (np.array([0.0, 0.0]), np.array([0.0, h1]))
                    p_2 = np.array([w + dx, dy])
                    edge_2 = (np.array([w, 0.0]), p_2)
                    host = hsl.slice_from_u_shape(edge_c, edge_1, edge_2, EPS)
                    jit = jsl.u_shape_cut(
                        jnp.asarray([0.0, 0.0]), jnp.asarray([w, 0.0]),
                        jnp.asarray([0.0, h1]), jnp.asarray(p_2, jnp.float32),
                        lp)
                    hb, jb = _bounds(host), _bounds(jit)
                    assert jb == pytest.approx(hb, abs=0.05), \
                        (w, h1, dx, dy, hb, jb)


def test_u_shape_all_slanted_mrr_differential():
    # no edge axis-aligned -> both tiers take the MRR-of-six-points branch
    edge_c = (np.array([0.0, 0.0]), np.array([90.0, 30.0]))
    edge_1 = (np.array([0.0, 0.0]), np.array([-20.0, 70.0]))
    edge_2 = (np.array([90.0, 30.0]), np.array([120.0, 95.0]))
    host = hsl.slice_from_u_shape(edge_c, edge_1, edge_2, EPS)
    jit = jsl.u_shape_cut(jnp.asarray([0.0, 0.0]), jnp.asarray([90.0, 30.0]),
                          jnp.asarray([-20.0, 70.0]),
                          jnp.asarray([120.0, 95.0]), _lp())
    hq = np.asarray(host, dtype=np.float64)[:4]
    jq = np.asarray(jit, dtype=np.float64)
    harea = 0.5 * abs(np.sum(hq[:, 0] * np.roll(hq[:, 1], -1)
                             - np.roll(hq[:, 0], -1) * hq[:, 1]))
    jarea = 0.5 * abs(np.sum(jq[:, 0] * np.roll(jq[:, 1], -1)
                             - np.roll(jq[:, 0], -1) * jq[:, 1]))
    # equal-area MRRs may differ in orientation (documented tie case);
    # area must agree
    assert jarea == pytest.approx(harea, rel=1e-3)


# ---------------------------------------------------------------------------
# part-edge deep/shallow probe (reference shapely.py:343-383)
# ---------------------------------------------------------------------------

def test_part_edge_shallow_hand():
    # 400x400 block, edge (100,0)-(300,0): deep probe (depth 280) leaves one
    # connected remainder -> shallow sweep of depth max_edge=200
    ring = [[0, 0], [400, 0], [400, 400], [0, 400]]
    host = hsl.slice_from_part_edge(
        np.asarray(ring, float), (np.array([100.0, 0.0]),
                                  np.array([300.0, 0.0])),
        EPS, 1.0, 200.0, 80.0)
    assert _bounds(host) == pytest.approx((100, 0, 300, 200))
    jring, nv = _pad_ring(ring)
    jit = jsl.part_edge_cut(jring, nv, jnp.asarray([100.0, 0.0]),
                            jnp.asarray([300.0, 0.0]), jnp.float32(200.0),
                            jnp.float32(80.0), _lp())
    assert _bounds(jit) == pytest.approx((100, 0, 300, 200), abs=1e-2)


def test_part_edge_deep_hand():
    # 400x250 block: the 280-deep probe crosses the block, splitting the
    # remainder into two pieces -> keep the deep probe (depth 280)
    ring = [[0, 0], [400, 0], [400, 250], [0, 250]]
    host = hsl.slice_from_part_edge(
        np.asarray(ring, float), (np.array([100.0, 0.0]),
                                  np.array([300.0, 0.0])),
        EPS, 1.0, 200.0, 80.0)
    assert _bounds(host) == pytest.approx((100, 0, 300, 280))
    jring, nv = _pad_ring(ring)
    jit = jsl.part_edge_cut(jring, nv, jnp.asarray([100.0, 0.0]),
                            jnp.asarray([300.0, 0.0]), jnp.float32(200.0),
                            jnp.float32(80.0), _lp())
    assert _bounds(jit) == pytest.approx((100, 0, 300, 280), abs=1e-2)


def test_part_edge_interior_side_flip():
    # same edge on the TOP boundary: the interior is now below, so the sweep
    # must go to negative y
    ring = [[0, 0], [400, 0], [400, 400], [0, 400]]
    host = hsl.slice_from_part_edge(
        np.asarray(ring, float), (np.array([300.0, 400.0]),
                                  np.array([100.0, 400.0])),
        EPS, 1.0, 200.0, 80.0)
    assert _bounds(host) == pytest.approx((100, 200, 300, 400))
    jring, nv = _pad_ring(ring)
    jit = jsl.part_edge_cut(jring, nv, jnp.asarray([300.0, 400.0]),
                            jnp.asarray([100.0, 400.0]), jnp.float32(200.0),
                            jnp.float32(80.0), _lp())
    assert _bounds(jit) == pytest.approx((100, 200, 300, 400), abs=1e-2)


def test_part_edge_differential_heights():
    # sweep block heights across the deep/shallow flip (away from the
    # 280 m decision boundary)
    lp = _lp()
    for h in (240.0, 260.0, 310.0, 420.0):
        ring = [[0, 0], [400, 0], [400, h], [0, h]]
        host = hsl.slice_from_part_edge(
            np.asarray(ring, float), (np.array([120.0, 0.0]),
                                      np.array([280.0, 0.0])),
            EPS, 1.0, 200.0, 80.0)
        jring, nv = _pad_ring(ring)
        jit = jsl.part_edge_cut(jring, nv, jnp.asarray([120.0, 0.0]),
                                jnp.asarray([280.0, 0.0]),
                                jnp.float32(200.0), jnp.float32(80.0), lp)
        assert _bounds(jit) == pytest.approx(_bounds(host), abs=0.05), h
