"""Faithful jitted port of the land-parcel slicing decision tree.

Branch-complete masked-compute mirror of the host oracle
``urban_tpu/geometry/slicer.py`` (itself a port of the reference tree,
khrylib/utils/shapely.py:9-785).  Where the round-2 jit tier collapsed the
U/L-shape refinement loops and rect-tri shrinking onto envelopes, this module
evaluates EVERY branch of the tree as fixed-shape compute and selects with
``jnp.where`` along the host's exact decision conditions:

  * the ring is angle-simplified (1 degree) before corner/mid-edge
    classification, like the host (reference plan_client.py:361-402) — the
    raw slot-table ring accumulates collinear seam vertices that must not
    count as corners
  * corner entry -> rect-tri / L-shape, mid-edge entry -> whole-edge /
    half-or-part-edge, with the host's whole-vs-sliced edge decisions
  * U-shape and rect-tri reflection loops unrolled to the host's 3
    iterations with a carry mask
  * the minimum rotated rectangle is exact (pairwise candidate directions,
    a superset of hull-edge directions)
  * part-edge sweeps decide deep-vs-shallow by counting boundary arcs of
    the ring outside the deep probe (the host counts difference pieces)

Known approximations vs the host (each measure-zero for snapped plans, all
covered by tests/test_jax_slicer.py differential cases): ring-vertex snap
onto a mid-edge intersection within ``distance+eps`` is skipped, and MRR
area-ties may pick a different (equal-area) orientation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from urban_tpu.jaxenv import geometry as jg

EPS = 1e-4          # PlanClient.EPSILON
DEG_TOL = 1.0       # PlanClient.DEG_TOL
THRES_DEG_U = 150.0
THRES_DEG_RT = 60.0
MAX_SCALE = 3


class LuParams(NamedTuple):
    """Per-land-use scalar constraints (meters) + cell size."""
    cell: jnp.ndarray
    min_edge: jnp.ndarray
    max_edge: jnp.ndarray
    search_max_length: jnp.ndarray   # max_edge + common_min_edge_length
    search_max_area: jnp.ndarray     # required_max_area
    search_min_area: jnp.ndarray     # required_min_area
    common_min_edge: jnp.ndarray


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def abs_angle_deg(v1, v2):
    """|signed angle| between two vectors in degrees (host get_angles_deg)."""
    dot = v1[0] * v2[0] + v1[1] * v2[1]
    det = v1[0] * v2[1] - v1[1] * v2[0]
    return jnp.degrees(jnp.arctan2(jnp.abs(det), dot))


def is_hv(a, b):
    """Axis-aligned within EPS (host check_horizontal_vertical)."""
    d = jnp.abs(b - a)
    return jnp.minimum(d[0], d[1]) < EPS


def envelope_of(pts: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) stacked points -> CCW axis-aligned rect (4, 2)."""
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    return jnp.stack([lo, jnp.stack([hi[0], lo[1]]), hi,
                      jnp.stack([lo[0], hi[1]])])


MRR_REL_TOL = 1e-5   # keep in sync with geometry/ops.py MRR_REL_TOL


def mrr_of(pts: jnp.ndarray) -> jnp.ndarray:
    """Minimum rotated rectangle of a small point set, (4, 2) CCW.

    Mirrors host ops.min_rotated_rect: candidate directions are the hull
    edges, and equal-area orientations (within MRR_REL_TOL relative) break
    by canonical angle in [0, pi) — WITHOUT this shared tie-break, an f32
    rounding flip under jit picks a different (equal-area) rectangle than
    the float64 host and the plans diverge."""
    n = pts.shape[0]
    hull, nh = jg.convex_hull_masked(pts, jnp.ones(n, bool))
    mh = jg.ring_mask(nh, n)
    d = jg.ring_next(hull, nh) - hull            # (N, 2) hull edges
    nd = jnp.linalg.norm(d, axis=-1)
    ok = mh & (nd > 1e-9)
    u = d / jnp.maximum(nd, 1e-9)[:, None]       # (N, 2)
    v = jnp.stack([-u[:, 1], u[:, 0]], axis=-1)
    px = jnp.sum(hull[:, None, :] * u[None, :, :], axis=-1)  # (N, M)
    py = jnp.sum(hull[:, None, :] * v[None, :, :], axis=-1)
    px = jnp.where(mh[:, None], px, px[0][None, :])   # pad rows -> point 0
    py = jnp.where(mh[:, None], py, py[0][None, :])
    w = px.max(axis=0) - px.min(axis=0)
    h = py.max(axis=0) - py.min(axis=0)
    area = jnp.where(ok, w * h, jg.BIG)
    amin = area.min()
    flip = (u[:, 1] < 0) | ((u[:, 1] == 0) & (u[:, 0] < 0))
    uc = jnp.where(flip[:, None], -u, u)
    theta = jnp.arctan2(uc[:, 1], uc[:, 0])
    tied = ok & (area <= amin * (1.0 + MRR_REL_TOL))
    k = jnp.argmin(jnp.where(tied, theta, jg.BIG))
    any_ok = jnp.any(ok)
    uk = jnp.where(any_ok, u[k], jnp.array([1.0, 0.0]))
    vk = jnp.stack([-uk[1], uk[0]])
    pu = jnp.where(mh, jnp.sum(hull * uk[None, :], axis=-1), jg.BIG)
    pv = jnp.where(mh, jnp.sum(hull * vk[None, :], axis=-1), jg.BIG)
    x0, x1 = pu.min(), jnp.where(mh, pu, -jg.BIG).max()
    y0, y1 = pv.min(), jnp.where(mh, pv, -jg.BIG).max()
    return jnp.stack([uk * x0 + vk * y0, uk * x1 + vk * y0,
                      uk * x1 + vk * y1, uk * x0 + vk * y1])


def point_in_ring_tol(p, ring, nv, tol: float = 1e-9):
    """Host ops.point_in_ring(p, ring, tol) == 1: strictly inside and not
    within tol of the boundary."""
    segs, m = jg.ring_segments(ring, nv)
    d = jnp.where(m, jg.point_segment_distance(p, segs[:, 0], segs[:, 1]),
                  jg.BIG)
    on_boundary = d.min() <= tol
    return jg.point_in_ring(p, ring, nv) & ~on_boundary


def interval_concave(ring, nv, p_c, p_1, p_2):
    """True when the interior angle p_1—p_c—p_2 is concave
    (host check_interval_angle).

    The host probes a point EPS=1e-4 inward from p_c and asks point_in_ring
    — sound in float64, but the f32 ULP at coordinates ~1e3 is ~1e-4, so a
    geometric probe collapses onto the boundary here.  p_c is always a ring
    vertex in every call site, so the probe is equivalent to an exact
    interior-cone sector test on the two boundary rays at p_c: the chord
    direction lies strictly inside the CCW sector from the outgoing edge to
    the ray back to the previous vertex iff the probe stays inside."""
    p_t = 0.5 * (p_1 + p_2)
    d = p_t - p_c
    nd = jnp.linalg.norm(d)
    degen = nd < 1e-9
    kv = ring.shape[0]
    m = jg.ring_mask(nv, kv)
    vd = jnp.where(m, jnp.linalg.norm(ring - p_c, axis=-1), jg.BIG)
    vi = jnp.argmin(vd)
    found = vd[vi] <= EPS
    nxt_idx = jg.ring_roll_indices(nv, kv)
    prv_idx = jnp.where(jnp.arange(kv) == 0, jnp.maximum(nv - 1, 0),
                        jnp.arange(kv) - 1)
    eo = ring[nxt_idx[vi]] - ring[vi]      # outgoing boundary ray
    av = ring[prv_idx[vi]] - ring[vi]      # ray back to the previous vertex
    c1 = eo[0] * d[1] - eo[1] * d[0]       # cross(eo, d)
    c2 = d[0] * av[1] - d[1] * av[0]       # cross(d, av)
    cs = eo[0] * av[1] - eo[1] * av[0]     # cross(eo, av): sector span
    inside = jnp.where(cs >= 0, (c1 > 0) & (c2 > 0), (c1 > 0) | (c2 > 0))
    inside = inside & found
    angle = abs_angle_deg(p_1 - p_c, p_2 - p_c)
    return degen | ~inside | (angle > THRES_DEG_U - EPS)


def slice_edge_end(X, E, pts, pt_alive, lp: LuParams, min_m, max_m, search_m):
    """Prefix endpoint of edge X->E per host slice_edge. Returns (P, whole).

    Prefers ending at the farthest feasible existing intersection on the
    edge; otherwise substrings to max_m."""
    L = jnp.linalg.norm(E - X)
    whole = L * lp.cell <= search_m
    d_seg = jg.point_segment_distance(pts, X[None], E[None])
    on_edge = pt_alive & (d_seg < EPS)
    d_x = jnp.linalg.norm(pts - X, axis=-1)
    feas = on_edge & (d_x * lp.cell >= min_m) & (d_x * lp.cell <= max_m)
    any_feas = jnp.any(feas)
    far = jnp.argmax(jnp.where(feas, d_x, -1.0))
    P_cand = pts[far]
    P_sub = X + (E - X) / jnp.maximum(L, 1e-9) * \
        jnp.minimum(max_m / lp.cell, L)
    P = jnp.where(whole, E, jnp.where(any_feas, P_cand, P_sub))
    return P, whole


def rectify(edge_len_grid, lp: LuParams):
    """Host rectify_slice_edge_length: (search, min, max) in meters."""
    el = jnp.maximum(edge_len_grid * lp.cell, 1e-9)
    rmin = jnp.maximum(lp.min_edge, lp.search_min_area / el)
    rmax = jnp.maximum(rmin, jnp.minimum(lp.max_edge,
                                         lp.search_max_area / el))
    rs = rmax + lp.common_min_edge
    return rs, rmin, rmax


def other_endpoint_at(ring, nv, p_c, exclude):
    """Far endpoint of the boundary edge at ring vertex p_c that does NOT
    contain `exclude` (host get_the_other_edge + other_endpoint).

    Returns (point, ok). ok=False mirrors the host SliceError when the
    vertex is not found or the number of candidate edges is not exactly 1.
    Like the host (geometry/slicer.py:82-94, reference shapely.py:127-148),
    ALL ring edges are scanned — not just the two adjacent to p_c: a ring
    that pinches back within tolerance of the corner yields 2-3 candidates
    and must FAIL, exactly as the host raises its SliceError (the seed-117
    divergence class, DIVERGENCE.md round 5)."""
    kv = ring.shape[0]
    m = jg.ring_mask(nv, kv)
    vd = jnp.where(m, jnp.linalg.norm(ring - p_c, axis=-1), jg.BIG)
    vi = jnp.argmin(vd)
    found = vd[vi] <= EPS
    nxt_idx = jg.ring_roll_indices(nv, kv)
    a = ring                       # edge i = (ring[i], ring[nxt[i]])
    b = ring[nxt_idx]
    d_pc = jg.point_segment_distance(p_c, a, b)
    d_ex = jg.point_segment_distance(exclude, a, b)
    # host tolerances: edge contains p_c at EPS*10 (+1e-9 f64 slack),
    # excludes the other corner at epsilon=EPS
    cand = m & (d_pc <= EPS * 10 + 1e-9) & (d_ex >= EPS)
    count = jnp.sum(cand)
    ei = jnp.argmax(cand)          # unique when count == 1 (the ok case)
    pa, pb = a[ei], b[ei]
    far = jnp.where(jnp.linalg.norm(pa - p_c) >= jnp.linalg.norm(pb - p_c),
                    pa, pb)
    ok = found & (count == 1)
    return far, ok


# ---------------------------------------------------------------------------
# leaf cut constructors
# ---------------------------------------------------------------------------

def _scale_reflect(p, p_c, seg_a, seg_b, target, thres_dis, bounded):
    """Host reflection loop: scale p away from p_c (up to 3 doublings) until
    the foot of p on segment (seg_a, seg_b) reaches `target`.

    bounded=True adds rect-tri's `dist(foot, target) < thres_dis` continue
    condition."""
    def foot_of(q):
        ab = seg_b - seg_a
        denom = jnp.maximum(jnp.sum(ab * ab), 1e-12)
        t = jnp.clip(jnp.sum((q - seg_a) * ab) / denom, 0.0, 1.0)
        return seg_a + t * ab

    cur = p
    for _ in range(MAX_SCALE):
        foot = foot_of(cur)
        dist = jnp.linalg.norm(foot - target)
        go = EPS < dist
        if bounded:
            go = go & (dist < thres_dis)
        cur = jnp.where(go, cur + (cur - p_c), cur)
    return cur


def u_shape_cut(p_c_1, p_c_2, p_1, p_2, lp: LuParams):
    """Host slice_from_u_shape for edges edge_c=(p_c_1,p_c_2),
    edge_1=(p_c_1,p_1), edge_2=(p_c_2,p_2)."""
    c_hv = is_hv(p_c_1, p_c_2)
    e1_hv = is_hv(p_c_1, p_1)
    e2_hv = is_hv(p_c_2, p_2)
    pts6 = jnp.stack([p_c_1, p_c_2, p_c_1, p_1, p_c_2, p_2])
    env6 = envelope_of(pts6)
    mrr6 = mrr_of(pts6)

    # refinement branch: edge_c axis-aligned, exactly one side edge not
    ang_1 = abs_angle_deg(p_2 - p_c_2, p_c_1 - p_c_2)   # e1_hv case
    p2s = _scale_reflect(p_2, p_c_2, p_c_1, p_1, p_1, 0.0, bounded=False)
    env_ref1 = envelope_of(jnp.stack([p_c_1, p_c_2, p_c_1, p_1, p_c_2, p2s]))
    cut_ref1 = jnp.where(ang_1 > THRES_DEG_U, env6, env_ref1)

    ang_2 = abs_angle_deg(p_1 - p_c_1, p_c_2 - p_c_1)   # e2_hv case
    p1s = _scale_reflect(p_1, p_c_1, p_c_2, p_2, p_2, 0.0, bounded=False)
    env_ref2 = envelope_of(jnp.stack([p_c_1, p_c_2, p_c_2, p_2, p_c_1, p1s]))
    cut_ref2 = jnp.where(ang_2 > THRES_DEG_U, env6, env_ref2)

    refine = c_hv & (e1_hv != e2_hv)
    cut_ref = jnp.where(e1_hv, cut_ref1, cut_ref2)
    none_hv = ~c_hv & ~e1_hv & ~e2_hv
    return jnp.where(none_hv, mrr6, jnp.where(refine, cut_ref, env6))


def angle_cut(p_c, p_1, p_2):
    """Host slice_from_angle for edges (p_c,p_1), (p_c,p_2)."""
    hv = is_hv(p_c, p_1) | is_hv(p_c, p_2)
    env = envelope_of(jnp.stack([p_c, p_1, p_2]))
    p_t = p_2 + p_1 - p_c
    mrr = mrr_of(jnp.stack([p_c, p_1, p_t, p_2]))
    return jnp.where(hv, env, mrr)


def rect_tri_cut(p_c, p_1, p_2, thres_dis, lp: LuParams):
    """Host slice_from_angle_rect_tri for edges (p_c,p_1), (p_c,p_2);
    thres_dis in grid units."""
    e1_hv = is_hv(p_c, p_1)
    e2_hv = is_hv(p_c, p_2)
    env = envelope_of(jnp.stack([p_c, p_1, p_2]))
    ang = abs_angle_deg(p_1 - p_c, p_2 - p_c)
    p2s = _scale_reflect(p_2, p_c, p_c, p_1, p_1, thres_dis, bounded=True)
    p1s = _scale_reflect(p_1, p_c, p_c, p_2, p_2, thres_dis, bounded=True)
    env_s1 = envelope_of(jnp.stack([p_c, p_1, p2s]))     # e1_hv branch
    env_s2 = envelope_of(jnp.stack([p_c, p1s, p_2]))     # e2_hv branch
    one_hv = jnp.where(ang > THRES_DEG_RT, env,
                       jnp.where(e1_hv, env_s1, env_s2))
    p_t = p_2 + p_1 - p_c
    mrr = mrr_of(jnp.stack([p_c, p_1, p_t, p_2]))
    return jnp.where(e1_hv & e2_hv, env,
                     jnp.where(e1_hv != e2_hv, one_hv, mrr))


def quad_side_distances(pts, quad):
    """Signed distance-like values of points vs each CCW quad edge's inward
    halfplane: (N, 4), positive inside."""
    a = quad
    b = jnp.roll(quad, -1, axis=0)
    d = b - a                                        # (4, 2)
    nrm = jnp.stack([-d[:, 1], d[:, 0]], axis=-1)    # inward normals (CCW)
    return jnp.sum((pts[:, None, :] - a[None, :, :]) * nrm[None, :, :],
                   axis=-1)


def _count_outside_arcs(ring, nv, quad):
    """Number of pieces `ring difference quad` splits into (the host counts
    the difference pieces exactly, reference shapely.py:373-377).

    For a CONVEX cutter the pieces of the difference biject with the maximal
    boundary arcs of the ring outside the quad, and each arc ends where the
    boundary ENTERS the quad.  Entries are counted by clipping every ring
    segment against the quad's four inward halfplanes (Liang-Barsky): a
    segment whose start vertex lies outside and whose clipped interval is
    nonempty records exactly one entry (a segment meets a convex region in
    at most one interval).  Unlike a vertex-transition count, this also
    catches segments that pass straight THROUGH the quad with both endpoints
    outside — e.g. a deep part-edge probe from the middle of a long block
    edge contains no ring vertex at all but still splits the block in two
    (tests/test_jax_slicer.py::test_part_edge_deep_hand)."""
    kv = ring.shape[0]
    m = jg.ring_mask(nv, kv)
    a = ring
    b = jg.ring_next(ring, nv)
    qa = quad
    qd = jnp.roll(quad, -1, axis=0) - qa
    nrm = jnp.stack([-qd[:, 1], qd[:, 0]], axis=-1)        # inward (CCW)
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    # signed distances of segment endpoints to each quad plane (KV, 4)
    s_a = jnp.sum((a[:, None, :] - qa[None]) * nrm[None], axis=-1)
    s_b = jnp.sum((b[:, None, :] - qa[None]) * nrm[None], axis=-1)
    TOL = 1e-3    # grid units; > f32 FMA noise at ~1e3-scale coordinates
    ds = s_b - s_a
    safe = jnp.where(jnp.abs(ds) > 1e-9, ds, 1e-9)
    t_cross = -s_a / safe
    # per-plane [lo, hi] of the segment-parameter interval inside the plane
    lo_p = jnp.where(ds > 1e-9, t_cross, -jg.BIG)
    hi_p = jnp.where(ds < -1e-9, t_cross, jg.BIG)
    parallel_out = (jnp.abs(ds) <= 1e-9) & (s_a < -TOL)
    lo_p = jnp.where(parallel_out, jg.BIG, lo_p)
    t0 = jnp.maximum(jnp.max(lo_p, axis=1), 0.0)
    t1 = jnp.minimum(jnp.min(hi_p, axis=1), 1.0)
    nonempty = t0 <= t1 + 1e-9
    start_outside = jnp.min(s_a, axis=1) < -TOL
    entries = jnp.sum(jnp.where(m, nonempty & start_outside, False))
    all_inside = jnp.all(jnp.where(m, jnp.min(s_a, axis=1) >= -TOL, True))
    return jnp.where(entries >= 1, entries, jnp.where(all_inside, 0, 1))


def part_edge_cut(ring, nv, a, b, max_buffer_m, thres_dis_m, lp: LuParams):
    """Host slice_from_part_edge: sweep a rectangle from edge a->b into the
    block; deep (max_buffer+thres) when the deep probe splits the remainder
    into >= 2 pieces, else shallow (max_buffer)."""
    mid = 0.5 * (a + b)
    d = b - a
    # Host probes 2*EPS off each side of the edge and compares clipped
    # areas — again below the f32 ULP at these coordinates.  Every call
    # site's (a, b) lies along a ring boundary edge, so the interior side
    # is exactly the left of the ring's CCW travel direction there: sign
    # from the alignment of b-a with the nearest boundary segment.
    segs, segm = jg.ring_segments(ring, nv)
    ds = jnp.where(segm, jg.point_segment_distance(mid, segs[:, 0],
                                                   segs[:, 1]), jg.BIG)
    si = jnp.argmin(ds)
    tdir = segs[si, 1] - segs[si, 0]
    hp = jnp.sum(d * tdir)
    sign = jnp.where(hp >= 0, 1.0, -1.0)
    deep = jg.oriented_rect(a, b, sign * (max_buffer_m + thres_dis_m)
                            / lp.cell)
    shallow = jg.oriented_rect(a, b, sign * max_buffer_m / lp.cell)
    n_pieces = _count_outside_arcs(ring, nv, deep)
    return jnp.where(n_pieces >= 2, deep, shallow)


# ---------------------------------------------------------------------------
# tree nodes
# ---------------------------------------------------------------------------

def l_shape_cut(ring, nv, p_c, p_1, p_2, e2_a, e2_b, pts, pt_alive,
                lp: LuParams):
    """Host slice_from_l_shape: edge_1=(p_c,p_1) is a whole boundary edge,
    edge_2=(e2_a,e2_b) with far point p_2. Returns (quad, fail)."""
    p_3, ok3 = other_endpoint_at(ring, nv, p_1, p_c)
    concave = interval_concave(ring, nv, p_1, p_c, p_3)

    cut_a = angle_cut(p_c, p_1, p_2)
    area_m = jg.ring_area(cut_a, jnp.asarray(4)) * lp.cell ** 2
    ang = abs_angle_deg(p_1 - p_c, p_2 - p_c)
    thres = lp.search_max_length - lp.max_edge
    cut_pe = part_edge_cut(ring, nv, e2_a, e2_b, lp.max_edge, thres, lp)
    use_pe = (area_m < lp.search_min_area) & (jnp.abs(ang - 90.0) < EPS)
    cut_concave = jnp.where(use_pe, cut_pe, cut_a)

    rs, rmin, rmax = rectify(jnp.linalg.norm(p_1 - p_c), lp)
    P3, _ = slice_edge_end(p_1, p_3, pts, pt_alive, lp, rmin, rmax, rs)
    cut_convex = u_shape_cut(p_c, p_1, p_2, P3, lp)
    # host raises from get_the_other_edge before the concave check, so ok3
    # gates BOTH branches
    return jnp.where(concave, cut_concave, cut_convex), ~ok3


def half_edge_cut(ring, nv, he_a, he_b, p_c, p_1, pts, pt_alive,
                  lp: LuParams):
    """Host slice_from_half_edge: half_edge=(he_a,he_b), corner p_c,
    intersection p_1. Returns (quad, fail)."""
    p_2, ok2 = other_endpoint_at(ring, nv, p_c, p_1)
    concave = interval_concave(ring, nv, p_c, p_1, p_2)

    el_m = jnp.maximum(jnp.linalg.norm(he_b - he_a), 1e-9) * lp.cell
    max_buf = jnp.maximum(lp.max_edge, lp.search_max_area / el_m)
    thres = lp.search_max_length - lp.max_edge
    cut_cc = part_edge_cut(ring, nv, he_a, he_b, max_buf, thres, lp)

    rs, rmin, rmax = rectify(jnp.linalg.norm(he_b - he_a), lp)
    P2, whole2 = slice_edge_end(p_c, p_2, pts, pt_alive, lp, rmin, rmax, rs)
    thres_grid = lp.common_min_edge / lp.cell
    cut_rt = rect_tri_cut(p_c, p_1, P2, thres_grid, lp)
    cut_l, fl = l_shape_cut(ring, nv, p_c, p_2, p_1, he_a, he_b, pts,
                            pt_alive, lp)
    cut_cv = jnp.where(whole2, cut_l, cut_rt)
    fail_cv = whole2 & fl
    return (jnp.where(concave, cut_cc, cut_cv),
            ~ok2 | (~concave & fail_cv))


def half_or_part_cut(ring, nv, X, E, pts, pt_alive, lp: LuParams):
    """Host slice_polygon_from_half_or_part_edge for edge (X, E) with
    intersection X and corner E. Returns (quad, fail)."""
    P, whole = slice_edge_end(X, E, pts, pt_alive, lp, lp.min_edge,
                              lp.max_edge, lp.search_max_length)
    el_m = jnp.maximum(jnp.linalg.norm(P - X), 1e-9) * lp.cell
    max_buf = jnp.maximum(lp.max_edge, lp.search_max_area / el_m)
    thres = lp.search_max_length - lp.max_edge
    cut_pe = part_edge_cut(ring, nv, X, P, max_buf, thres, lp)
    cut_he, fhe = half_edge_cut(ring, nv, X, E, E, X, pts, pt_alive, lp)
    return jnp.where(whole, cut_he, cut_pe), whole & fhe


def whole_edge_cut(ring, nv, pc1, pc2, pts, pt_alive, lp: LuParams):
    """Host slice_from_whole_edge for boundary edge (pc1, pc2).
    Returns (quad, fail). The two endpoint-symmetric subtrees run as one
    2-lane vmap — the op-count of the tree, not its FLOPs, bounds the
    rollout step rate."""
    PC = jnp.stack([pc1, pc2])
    PCo = jnp.stack([pc2, pc1])
    P12, OK12 = jax.vmap(other_endpoint_at, in_axes=(None, None, 0, 0))(
        ring, nv, PC, PCo)
    p_1, p_2 = P12[0], P12[1]
    ok1, ok2 = OK12[0], OK12[1]
    CC = jax.vmap(interval_concave, in_axes=(None, None, 0, 0, 0))(
        ring, nv, PC, P12, PCo)
    cc1, cc2 = CC[0], CC[1]

    el = jnp.linalg.norm(pc2 - pc1)
    el_m = jnp.maximum(el, 1e-9) * lp.cell
    max_buf = jnp.maximum(lp.max_edge, lp.search_max_area / el_m)
    thres = lp.search_max_length - lp.max_edge
    cut_pp = part_edge_cut(ring, nv, pc1, pc2, max_buf, thres, lp)

    rs, rmin, rmax = rectify(el, lp)
    S12, W12 = jax.vmap(
        slice_edge_end,
        in_axes=(0, 0, None, None, None, None, None, None))(
        PC, P12, pts, pt_alive, lp, rmin, rmax, rs)
    s1, s2 = S12[0], S12[1]
    w1, w2 = W12[0], W12[1]
    cut_uu = u_shape_cut(pc1, pc2, s1, s2, lp)

    CA = jax.vmap(angle_cut)(PC, PCo, S12)
    CL, FL = jax.vmap(
        l_shape_cut, in_axes=(None, None, 0, 0, 0, 0, 0, None, None, None))(
        ring, nv, PC, P12, PCo, PC, PCo, pts, pt_alive, lp)
    cut_cv1 = jnp.where(w1, CL[0], CA[0])
    fail_cv1 = w1 & FL[0]
    cut_cv2 = jnp.where(w2, CL[1], CA[1])
    fail_cv2 = w2 & FL[1]

    cut = jnp.where(cc1 & cc2, cut_pp,
                    jnp.where(~cc1 & ~cc2, cut_uu,
                              jnp.where(~cc1, cut_cv1, cut_cv2)))
    # host resolves both other-edges up front, so ok1/ok2 gate every branch
    fail = ~ok1 | ~ok2 | jnp.where(cc1 & cc2, False,
                                   jnp.where(~cc1 & ~cc2, False,
                                             jnp.where(~cc1, fail_cv1,
                                                       fail_cv2)))
    return cut, fail


def corner_convex_cut(ring, nv, X, p_1, p_2, pts, pt_alive, lp: LuParams):
    """Convex-corner branch of host slice_polygon_from_corner (rect-tri /
    the two L-shapes), with the symmetric lanes vmapped. Returns
    (quad, fail)."""
    P = jnp.stack([p_1, p_2])
    S12, W12 = jax.vmap(
        slice_edge_end,
        in_axes=(None, 0, None, None, None, None, None, None))(
        X, P, pts, pt_alive, lp, lp.min_edge, lp.max_edge,
        lp.search_max_length)
    s1, s2 = S12[0], S12[1]
    w1, w2 = W12[0], W12[1]
    thres_grid = lp.common_min_edge / lp.cell
    cut_rt = rect_tri_cut(X, s1, s2, thres_grid, lp)
    Sswap = jnp.stack([s2, s1])
    CL, FL = jax.vmap(
        l_shape_cut, in_axes=(None, None, None, 0, 0, None, 0, None, None,
                              None))(
        ring, nv, X, P, Sswap, X, Sswap, pts, pt_alive, lp)
    cut_cv = jnp.where(~w1 & ~w2, cut_rt,
                       jnp.where(w1, CL[0], CL[1]))
    fail_cv = jnp.where(~w1 & ~w2, False, jnp.where(w1, FL[0], FL[1]))
    return cut_cv, fail_cv


# ---------------------------------------------------------------------------
# ring simplification + entry
# ---------------------------------------------------------------------------

def simplify_by_angle(ring, nv, deg_tol: float = DEG_TOL):
    """Masked mirror of host ops.simplify_ring_by_angle: drop vertices whose
    turn angle is below deg_tol (keeps original order; returns original ring
    when fewer than 3 vertices survive)."""
    kv = ring.shape[0]
    m = jg.ring_mask(nv, kv)
    nxt = jg.ring_next(ring, nv)
    prv = jg.ring_prev(ring, nv)
    v_in = ring - prv           # edge arriving at each vertex
    v_out = nxt - ring          # edge leaving each vertex
    dot = jnp.sum(v_in * v_out, axis=-1)
    det = v_in[:, 0] * v_out[:, 1] - v_in[:, 1] * v_out[:, 0]
    ang = jnp.degrees(jnp.arctan2(jnp.abs(det), dot))
    keep = m & (ang > deg_tol)
    n_keep = jnp.sum(keep)
    keep = jnp.where(n_keep >= 3, keep, m)
    counts = keep.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    out = jg.onehot_place(ring, offsets, keep, kv)
    return out, jnp.where(n_keep >= 3, n_keep, nv)


def compute_cutter(ring, nv, X, pts, pt_alive, lp: LuParams):
    """Slice-cut construction for one block + chosen intersection.

    Mirrors host slice_polygon through simplify_and_classify and the full
    decision tree. Returns (simplified_ring, simplified_nv, quad, fail)."""
    # the host classifies on polygon.canonicalize() (slicer.py:512 —
    # reference plan_client.py:361-402), so the corner touching-edge ORDER
    # ((next, prev) vs (prev, next)) depends on the ring's rotation: enter
    # in the host's canonical frame or the L/U-shape lanes swap (grid
    # seed 112 class, DIVERGENCE.md round 5)
    ring, nv = jg.canonicalize_ring(ring, nv)
    S, snv = simplify_by_angle(ring, nv)
    kv = S.shape[0]
    m = jg.ring_mask(snv, kv)
    vdist = jnp.where(m, jnp.linalg.norm(S - X, axis=-1), jg.BIG)
    vi = jnp.argmin(vdist)
    is_corner = vdist[vi] <= EPS

    nxt_idx = jg.ring_roll_indices(snv, kv)
    prv_idx = jnp.where(jnp.arange(kv) == 0, jnp.maximum(snv - 1, 0),
                        jnp.arange(kv) - 1)

    # corner: host touching-edge order gives (p_1, p_2) = (next, prev) when
    # the corner is vertex 0, else (prev, next)
    at0 = vi == 0
    p_1c = jnp.where(at0, S[nxt_idx[vi]], S[prv_idx[vi]])
    p_2c = jnp.where(at0, S[prv_idx[vi]], S[nxt_idx[vi]])
    concave0 = interval_concave(S, snv, X, p_1c, p_2c)
    cut_cv, fail_cv = corner_convex_cut(S, snv, X, p_1c, p_2c, pts,
                                        pt_alive, lp)
    use1 = jnp.linalg.norm(p_1c - X) >= jnp.linalg.norm(p_2c - X)
    E_cc = jnp.where(use1, p_1c, p_2c)

    # mid-edge: nearest boundary edge, host near-two-edges failure
    segs, segmask = jg.ring_segments(S, snv)
    edist = jnp.where(segmask,
                      jg.point_segment_distance(X, segs[:, 0], segs[:, 1]),
                      jg.BIG)
    dmin = edist.min()
    near = edist < dmin + EPS
    fail_two = jnp.sum(near) > 1
    ei = jnp.argmax(near)
    A = S[ei]
    B = S[nxt_idx[ei]]
    short = jnp.linalg.norm(B - A) * lp.cell <= lp.search_max_length
    cut_we, fwe = whole_edge_cut(S, snv, A, B, pts, pt_alive, lp)
    use_A = jnp.linalg.norm(A - X) >= jnp.linalg.norm(B - X)
    E_we = jnp.where(use_A, A, B)

    # the concave-corner and long-edge subtrees are the same
    # half_or_part_cut with different far endpoints — one 2-lane vmap
    CH, FH = jax.vmap(
        half_or_part_cut, in_axes=(None, None, None, 0, None, None, None))(
        S, snv, X, jnp.stack([E_cc, E_we]), pts, pt_alive, lp)

    cut_c = jnp.where(concave0, CH[0], cut_cv)
    fail_c = jnp.where(concave0, FH[0], fail_cv)
    cut_e = jnp.where(short, cut_we, CH[1])
    fail_e = jnp.where(short, fwe, FH[1])

    cut = jnp.where(is_corner, cut_c, cut_e)
    fail = jnp.where(is_corner, fail_c, fail_e | fail_two)
    return S, snv, cut, fail
