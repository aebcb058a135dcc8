"""Jittable fixed-buffer geometry kernels for the batched TPU environment.

Masked-array mirrors of urban_tpu.geometry.ops: polygon rings live in
``(KV, 2)`` buffers with a vertex count; every routine is shape-static and
branchless so it vmaps over thousands of environments and compiles once.
The host kernel is the differential-testing oracle (tests/test_jax_geometry).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e30
FLT_EPS = 1.1920929e-7   # np.finfo(np.float32).eps


def ring_mask(nvert: jnp.ndarray, kv: int) -> jnp.ndarray:
    """(KV,) bool mask of valid vertices."""
    return jnp.arange(kv) < nvert


_OH_SELECT_MAX = 1 << 18   # elements; above this the MXU einsum wins


def onehot_place(values: jnp.ndarray, idx: jnp.ndarray, ok: jnp.ndarray,
                 out_len: int) -> jnp.ndarray:
    """out[o] = values[i] where ok[i] and idx[i] == o (zeros elsewhere).

    Scatter replacement for small fixed-shape compactions: a batched
    .at[].set lowers to a serial per-row loop on TPU (the neighbor-snap
    pass alone profiled at ~90 ms/step through that path). Callers
    guarantee at most one contributor per output row, so the sum is exact.

    Two lowerings by static size: small placements run as a masked
    select+sum on the VPU — a tiny f32-HIGHEST dot costs ~140 us of MXU
    latency (6-pass bf16 emulation) while the (O, I, D) select reduce is
    ~2 us — and only genuinely large contractions take the einsum.
    values: (n,) or (n, d), any dtype representable in f32 (< 2^24)."""
    sel = jnp.arange(out_len)
    oh = (jnp.where(ok, idx, out_len + 1)[None, :] == sel[:, None])
    v = values[:, None] if values.ndim == 1 else values
    n, d = v.shape
    if out_len * n * d <= _OH_SELECT_MAX:
        out = jnp.sum(jnp.where(oh[:, :, None], v[None, :, :], 0),
                      axis=1).astype(values.dtype)
    elif v.dtype == jnp.bool_:
        # 0/1 values are exact in bf16 — skip the 6-pass f32 emulation
        out = jnp.einsum('oi,id->od', oh.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) > 0.5
    else:
        acc = jnp.float64 if v.dtype == jnp.float64 else jnp.float32
        out = jnp.einsum('oi,id->od', oh.astype(acc), v.astype(acc),
                         preferred_element_type=acc,
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(values.dtype)
    return out[:, 0] if values.ndim == 1 else out


def onehot_update(old: jnp.ndarray, values: jnp.ndarray, idx: jnp.ndarray,
                  ok: jnp.ndarray) -> jnp.ndarray:
    """old with rows idx[i] replaced by values[i] where ok[i] — the
    read-modify-write companion of onehot_place (same scatter-avoidance
    rationale). At most one contributor per row."""
    out_len = old.shape[0]
    sel = jnp.arange(out_len)
    oh = (jnp.where(ok, idx, out_len + 1)[None, :] == sel[:, None])
    hit = jnp.any(oh, axis=1)
    placed = onehot_place(values, idx, ok, out_len)
    if old.ndim > 1:
        hit = hit.reshape((out_len,) + (1,) * (old.ndim - 1))
    return jnp.where(hit, placed.astype(old.dtype), old)


def onehot_mask(idx: jnp.ndarray, ok: jnp.ndarray, out_len: int
                ) -> jnp.ndarray:
    """(out_len,) bool: True where some ok[i] has idx[i] == o."""
    sel = jnp.arange(out_len)
    oh = (jnp.where(ok, idx, out_len + 1)[None, :] == sel[:, None])
    return jnp.any(oh, axis=1)


def ring_roll_indices(nvert: jnp.ndarray, kv: int) -> jnp.ndarray:
    """Index of each vertex's ring successor (wrapping at nvert).

    Only for single-vertex lookups (ring[idx[vi]]); full-ring successor
    arrays must use ring_next — a (KV,) gather serializes on TPU."""
    idx = jnp.arange(kv) + 1
    return jnp.where(idx >= nvert, 0, idx)


def ring_next(x: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    """Successor of each ring position along axis 0, wrapping at nvert.

    Gather-free: TPU row gathers execute ~1 row per several cycles
    (profiled at ~3 ms per 128x256x20 ring-roll in the rollout step);
    roll+select is a pure elementwise rotation. Positions >= nvert hold
    rotated garbage — every caller masks with ring_mask."""
    rolled = jnp.roll(x, -1, axis=0)
    wrap = jnp.arange(x.shape[0]) == nvert - 1
    w = wrap.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(w, x[0], rolled)


def ring_prev(x: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    """Predecessor of each ring position along axis 0 (wrap at 0)."""
    rolled = jnp.roll(x, 1, axis=0)
    wrap = jnp.arange(x.shape[0]) == 0
    w = wrap.reshape((-1,) + (1,) * (x.ndim - 1))
    last = x[jnp.maximum(nvert - 1, 0)]
    return jnp.where(w, last, rolled)


def ring_area(ring: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    """Unsigned polygon area of a masked ring buffer (KV, 2)."""
    return jnp.abs(ring_signed_area(ring, nvert))


def ring_signed_area(ring: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    # shoelace on vertex-0-centered coordinates: translation-invariant, so
    # the f32 products stay at feature scale (~1e5) instead of absolute
    # coordinate scale (~1e6) — a 50x noise reduction that matters for the
    # degenerate-piece (area ~ 0) thresholds downstream
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    r0 = ring - ring[0]
    nxt = ring_next(r0, nvert)
    cross = r0[:, 0] * nxt[:, 1] - nxt[:, 0] * r0[:, 1]
    return 0.5 * jnp.sum(jnp.where(m, cross, 0.0))


def ring_perimeter(ring: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    nxt = ring_next(ring, nvert)
    d = jnp.linalg.norm(nxt - ring, axis=-1)
    return jnp.sum(jnp.where(m, d, 0.0))


def ring_centroid(ring: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    """Area centroid; falls back to vertex mean for degenerate rings."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    r0 = ring - ring[0]               # vertex-0-centered (see ring_signed_area)
    nxt = ring_next(r0, nvert)
    cross = r0[:, 0] * nxt[:, 1] - nxt[:, 0] * r0[:, 1]
    cross = jnp.where(m, cross, 0.0)
    a = jnp.sum(cross) / 2.0
    cx = jnp.sum((r0[:, 0] + nxt[:, 0]) * cross) / 6.0
    cy = jnp.sum((r0[:, 1] + nxt[:, 1]) * cross) / 6.0
    safe = jnp.abs(a) > 1e-9
    mean = jnp.sum(jnp.where(m[:, None], ring, 0.0), axis=0) / \
        jnp.maximum(nvert, 1)
    return jnp.where(safe,
                     ring[0] + jnp.stack([cx, cy]) / jnp.where(safe, a, 1.0),
                     mean)


def ring_bounds(ring: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    """(4,) minx, miny, maxx, maxy over valid vertices."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)[:, None]
    lo = jnp.min(jnp.where(m, ring, BIG), axis=0)
    hi = jnp.max(jnp.where(m, ring, -BIG), axis=0)
    return jnp.concatenate([lo, hi])


def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly (no branch, FMA-proof)."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split_f32(a):
    """Veltkamp split for f32 (24-bit mantissa): a == hi + lo with hi
    carrying the top 12 bits. 4097 = 2**12 + 1."""
    c = a * jnp.float32(4097.0)
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker TwoProduct: p + err == a * b exactly in f32 (no FMA needed;
    XLA does not reassociate or contract these by default)."""
    p = a * b
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def cross2_compensated(ux, uy, vx, vy):
    """ux*vy - uy*vx as a compensated f32 value (error ~2^-24 relative to
    the true result instead of to the PRODUCTS — the difference matters
    precisely in the near-parallel cancellation case).

    This is the jit tier's answer to the host engine's f64 crossing math
    (urban_tpu/geometry/ops.py halfplane_clip; reference behavior:
    khrylib/utils/shapely.py slicing on shapely's f64 coordinates): the
    residual host-vs-jit divergence class measured in DIVERGENCE.md was
    ill-conditioned cut-side x block-edge intersections drifting ~1e-2
    grid units; with the compensated cross the dominant error is the one
    f32 rounding of the inputs (~1e-4), and the downstream t division is
    benign (numerator and denominator signs oppose at a crossing)."""
    p1, e1 = _two_prod(ux, vy)
    p2, e2 = _two_prod(uy, vx)
    s, e3 = _two_sum(p1, -p2)
    return s + (e1 - e2 + e3)


def point_segment_distance(p: jnp.ndarray, a: jnp.ndarray,
                           b: jnp.ndarray) -> jnp.ndarray:
    """Broadcasted point-to-segment distance on (..., 2) arrays."""
    ab = b - a
    ap = p - a
    denom = jnp.sum(ab * ab, axis=-1)
    t = jnp.where(denom > 0, jnp.sum(ap * ab, axis=-1)
                  / jnp.maximum(denom, 1e-12), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def segments_cross(p1, p2, a, b, eps: float = 1e-9):
    """Broadcasted PROPER segment crossing test on (..., 2) arrays.

    True when segments (p1,p2) and (a,b) cross at an interior point of
    both; touching at endpoints or collinear overlap counts as False (used
    by the raster face decomposition, where a dangling road endpoint on a
    walk line must not separate faces — polygonize ignores dangles)."""
    def cross(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]
    d1 = cross(b - a, p1 - a)
    d2 = cross(b - a, p2 - a)
    d3 = cross(p2 - p1, a - p1)
    d4 = cross(p2 - p1, b - p1)
    return (d1 * d2 < -eps) & (d3 * d4 < -eps)


def point_in_ring(p: jnp.ndarray, ring: jnp.ndarray,
                  nvert: jnp.ndarray) -> jnp.ndarray:
    """Strict interior test (crossing number), bool."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    a = ring
    b = ring_next(ring, nvert)
    cond = (a[:, 1] > p[1]) != (b[:, 1] > p[1])
    denom = b[:, 1] - a[:, 1]
    xin = a[:, 0] + (p[1] - a[:, 1]) * (b[:, 0] - a[:, 0]) / \
        jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    crossings = jnp.sum(jnp.where(m & cond & (p[0] < xin), 1, 0))
    return (crossings % 2) == 1


def ring_segments(ring: jnp.ndarray, nvert: jnp.ndarray):
    """(KV, 2, 2) boundary segments + validity mask."""
    kv = ring.shape[0]
    nxt = ring_next(ring, nvert)
    return jnp.stack([ring, nxt], axis=1), ring_mask(nvert, kv)


def halfplane_clip_ring(ring: jnp.ndarray, nvert: jnp.ndarray,
                        a: jnp.ndarray, b: jnp.ndarray,
                        keep_left: bool | jnp.ndarray = True):
    """Sutherland–Hodgman half-plane clip on a fixed (KV, 2) buffer.

    Output ring buffer has the same capacity; a clip can add at most as many
    vertices as it removes plus two, so callers must size KV with slack.
    Multi-piece results come out as one bridged ring (area preserved); the
    exact splitter lives host-side (urban_tpu/geometry/ops.py halfplane_clip).
    Returns (out_ring, out_nvert, overflow_flag).
    """
    kv = ring.shape[0]
    d = b - a
    m = ring_mask(nvert, kv)
    # side = cross(d, r - a), computed COMPENSATED: the near-parallel
    # cancellation in this cross product was the dominant host-vs-jit
    # divergence source (DIVERGENCE.md); plain f32 leaves ~1e-3 absolute
    # noise that the t division below amplifies into ~1e-2 coordinate
    # drift. Elementwise VPU math — never a bf16 dot_general.
    u = ring - a
    side = cross2_compensated(d[0], d[1], u[:, 0], u[:, 1])
    side = jnp.where(keep_left, side, -side)
    side_nxt = ring_next(side, nvert)
    ring_nxt = ring_next(ring, nvert)

    keep_cur = (side >= -1e-9) & m
    # crossing from inside to outside or outside to inside
    crosses = ((side > 1e-9) & (side_nxt < -1e-9)) | \
              ((side < -1e-9) & (side_nxt > 1e-9))
    crosses = crosses & m
    t = side / jnp.where(jnp.abs(side - side_nxt) > 1e-12,
                         side - side_nxt, 1.0)
    cross_pt = ring + t[:, None] * (ring_nxt - ring)

    # each input vertex emits up to 2 outputs: itself (if kept) then the
    # crossing point (if its edge crosses)
    emit_cur = keep_cur
    emit_cross = crosses
    counts = emit_cur.astype(jnp.int32) + emit_cross.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    total = jnp.sum(counts)

    out = onehot_place(ring, offsets, emit_cur, 2 * kv) + \
        onehot_place(cross_pt, offsets + emit_cur.astype(jnp.int32),
                     emit_cross, 2 * kv)
    overflow = total > kv
    out_ring = out[:kv]
    out_nvert = jnp.minimum(total, kv)
    return out_ring, out_nvert, overflow


def dedupe_ring(ring: jnp.ndarray, nvert: jnp.ndarray, tol: float = 1e-7):
    """Drop consecutive near-duplicate vertices (masked compaction),
    including the wraparound closure: trailing vertices within tol of
    vertex 0 are dropped, mirroring the host oracle's dedupe_ring
    (geometry/ops.py:218-229) — a raw f32 arc walk can re-emit its start
    crossing as the final vertex with ~ulp noise, which the host's
    GEOS-backed rings never carry."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    pos = jnp.arange(kv)
    dup = jnp.linalg.norm(ring - ring_prev(ring, nvert), axis=-1) <= tol
    keep = m & (~dup | (pos == 0))
    # trailing run of wrap-duplicates of vertex 0. The host trims AFTER
    # compaction (geometry/ops.py:227-229), so vertices already dropped by
    # the consecutive-dup pass are transparent here: a trailing drift chain
    # [.., v0+0.8t, v0+1.6t] compacts to its first member, which the host's
    # while-loop then drops — without the ~keep term the 1.6t member would
    # break the suffix run and leave a wrap-duplicate the host drops.
    # Residual (accepted, documented in step.py DEVIATIONS): the host's dup
    # compaction chains against the last-KEPT vertex, this one against the
    # immediate predecessor; they differ only on monotone drift chains
    # spanning >1 tol, which f32 arc-walk noise (~ulp) cannot produce.
    ok = (jnp.linalg.norm(ring - ring[0], axis=-1) <= tol) | ~m | ~keep
    suffix_all = jnp.flip(jnp.cumprod(jnp.flip(ok.astype(jnp.int32))))
    keep = keep & ~(suffix_all.astype(bool) & (pos > 0))
    counts = keep.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    out = onehot_place(ring, offsets, keep, kv)
    return out, jnp.sum(counts)


def envelope_rect(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bounding rectangle (4, 2) of masked points."""
    m = mask[:, None]
    lo = jnp.min(jnp.where(m, points, BIG), axis=0)
    hi = jnp.max(jnp.where(m, points, -BIG), axis=0)
    return jnp.stack([lo, jnp.stack([hi[0], lo[1]]), hi,
                      jnp.stack([lo[0], hi[1]])])


def oriented_rect(a: jnp.ndarray, b: jnp.ndarray, depth: jnp.ndarray
                  ) -> jnp.ndarray:
    """Rectangle swept left from segment a→b by `depth` (single-sided
    buffer of a 2-point line; negative depth sweeps right). CCW (4, 2)."""
    d = b - a
    nd = jnp.maximum(jnp.linalg.norm(d), 1e-12)
    nrm = jnp.stack([-d[1], d[0]]) / nd * depth
    ring = jnp.stack([a, b, b + nrm, a + nrm])
    # ensure CCW
    x, y = ring[:, 0], ring[:, 1]
    signed = 0.5 * jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
    return jnp.where(signed >= 0, ring, ring[::-1])


def clip_poly_by_convex_quad(ring: jnp.ndarray, nvert: jnp.ndarray,
                             quad: jnp.ndarray):
    """Clip a masked ring by a convex quadrilateral (CCW).

    Returns (out_ring, out_nvert, overflow)."""
    out, n = ring, nvert
    overflow = jnp.asarray(False)
    for i in range(4):
        out, n, ovf = halfplane_clip_ring(out, n, quad[i], quad[(i + 1) % 4],
                                          True)
        overflow = overflow | ovf
    out, n = dedupe_ring(out, n)
    return out, n, overflow


def difference_pieces_by_quad(ring: jnp.ndarray, nvert: jnp.ndarray,
                              quad: jnp.ndarray):
    """Subtract a convex quad: returns 4 wedge pieces (some empty).

    piece_i = ring ∩ H_0 ∩ ... ∩ H_{i-1} ∩ H_iᶜ  — exact for convex cutters
    (mirrors urban_tpu/geometry/ops.py difference_convex, without the
    cross-wedge merge; wedge seams are existing-vertex-to-existing-vertex
    chords that the snap step reconciles)."""
    kv = ring.shape[0]
    pieces_ring = []
    pieces_n = []
    overflow = jnp.asarray(False)
    cur, cur_n = ring, nvert
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        out_r, out_n, ovf1 = halfplane_clip_ring(cur, cur_n, a, b, False)
        out_r, out_n = dedupe_ring(out_r, out_n)
        pieces_ring.append(out_r)
        pieces_n.append(out_n)
        cur, cur_n, ovf2 = halfplane_clip_ring(cur, cur_n, a, b, True)
        cur, cur_n = dedupe_ring(cur, cur_n)
        overflow = overflow | ovf1 | ovf2
    return jnp.stack(pieces_ring), jnp.stack(pieces_n), overflow


# ---------------------------------------------------------------------------
# convex hull, connected boolean pieces, simplification (round-3 additions
# backing the branch-complete jit slicer; host oracles: geometry/ops.py
# convex_hull / clip_polygon_convex / difference_convex / simplify_ring_dp,
# themselves ports of reference plan_client.py:445-512)
# ---------------------------------------------------------------------------


def convex_hull_masked(pts: jnp.ndarray, mask: jnp.ndarray,
                       eps: float = 1e-7):
    """Convex hull of masked points as a CCW masked ring (K, 2), nh.

    Directed-edge formulation (branchless O(K^3) instead of a sequential
    Graham scan): i->j is a hull edge iff every active point lies left of
    the line i->j, and points collinear with it sit inside the segment span
    (so each supporting line contributes exactly its extreme pair). Hull
    vertices are the edge tails, ordered CCW by angle around their mean —
    valid because the hull is convex and the mean is interior."""
    k = pts.shape[0]
    d = pts[None, :, :] - pts[:, None, :]            # d[i, j] = pts[j]-pts[i]
    dlen = jnp.linalg.norm(d, axis=-1)               # (K, K)
    # cross[i, j, k] = (j - i) x (k - i)
    cross = d[:, :, None, 0] * d[:, None, :, 1] - \
        d[:, :, None, 1] * d[:, None, :, 0]
    # XLA contracts a*b - c*d to fma(a, b, -c*d): even the identically-zero
    # self-cross (j-i)x(j-i) comes back as ±ulp(|d|^2) ≈ 5e-4 at these
    # coordinate scales. Scale the tolerance with BOTH leg lengths (the
    # cross magnitude) so FMA noise can never outvote it, and exempt the
    # edge's own endpoints, which satisfy the halfplane test identically.
    tolc = jnp.maximum(eps * dlen[:, :, None],
                       32 * FLT_EPS * dlen[:, :, None] * dlen[:, None, :])
    left_ok = cross >= -tolc
    collinear = jnp.abs(cross) <= tolc
    denom = jnp.maximum(dlen * dlen, 1e-12)
    t = jnp.sum(d[:, :, None, :] * d[:, None, :, :], axis=-1) \
        / denom[:, :, None]
    span_ok = ~collinear | ((t >= -eps) & (t <= 1.0 + eps))
    idk = jnp.arange(k)
    is_end = (idk[None, None, :] == idk[:, None, None]) | \
        (idk[None, None, :] == idk[None, :, None])
    pt_ok = ~mask[None, None, :] | is_end | (left_ok & span_ok)
    valid = (mask[:, None] & mask[None, :] & (dlen > eps)
             & jnp.all(pt_ok, axis=2))
    jnp_eye = jnp.eye(k, dtype=bool)
    valid = valid & ~jnp_eye
    on_hull = jnp.any(valid, axis=1) & mask
    nh = jnp.sum(on_hull)
    c = jnp.sum(jnp.where(on_hull[:, None], pts, 0.0), axis=0) / \
        jnp.maximum(nh, 1)
    ang = jnp.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    key = jnp.where(on_hull, ang, BIG)
    # rank among hull verts by (angle, index)
    smaller = (key[None, :] < key[:, None]) | \
        ((key[None, :] == key[:, None])
         & (jnp.arange(k)[None, :] < jnp.arange(k)[:, None]))
    rank = jnp.sum(jnp.where(on_hull[None, :], smaller, False), axis=1)
    out = onehot_place(pts, rank, on_hull, k)
    return out, nh


def canonicalize_ring(ring: jnp.ndarray, nvert: jnp.ndarray):
    """CCW orientation + rotation to the lexicographically smallest vertex
    (host Geometry.canonicalize, geometry/base.py:129-138).

    Douglas-Peucker anchors at ring position 0, so borderline vertices
    (within ~tol of a chord) survive or die depending on the start vertex —
    the jit tier must enter DP in the host's canonical frame or the two
    tiers simplify the same parcel differently. Returns (ring, nvert)."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    pos = jnp.arange(kv)
    n = jnp.maximum(nvert, 1)
    # orientation: reverse the valid prefix when CW
    ccw = ring_signed_area(ring, nvert) >= 0
    rev_src = jnp.mod(n - 1 - pos, n)
    fwd_src = pos
    src0 = jnp.where(ccw, fwd_src, rev_src)
    onehot0 = (src0[:, None] == pos[None, :]) & m[None, :] & m[:, None]
    r1 = jnp.sum(jnp.where(onehot0[:, :, None], ring[None, :, :], 0.0),
                 axis=1)
    # lexicographic start: min x, then min y (exact f32 comparisons)
    xkey = jnp.where(m, r1[:, 0], BIG)
    minx = jnp.min(xkey)
    cand = m & (xkey == minx)
    ykey = jnp.where(cand, r1[:, 1], BIG)
    start = jnp.argmin(ykey)
    src1 = jnp.mod(start + pos, n)
    onehot1 = (src1[:, None] == pos[None, :]) & m[None, :] & m[:, None]
    r2 = jnp.sum(jnp.where(onehot1[:, :, None], r1[None, :, :], 0.0),
                 axis=1)
    return r2, nvert


def arc_pieces(ring: jnp.ndarray, nvert: jnp.ndarray, hull: jnp.ndarray,
               nh: jnp.ndarray, keep_inside: bool, n_pieces: int = 4,
               eps: float = 0.05, t_eps: float = 1e-3):
    # eps: side-of-plane slack for ring vertices, in grid units. When a
    # hull vertex is an f32-snapped crossing ON a ring edge, the plane
    # through it tilts off the edge by ~ulp(coord); the lever arm to a far
    # ring vertex amplifies that to ~1e-2 — measured, not hypothetical —
    # so exactly-collinear configurations (parcel corner cut into a block
    # edge) need ~0.05 slack to classify like the float64 host. The engine
    # snaps ALL geometry at 1 grid unit (SNAP_EPSILON), so nothing
    # meaningful lives below that scale. t_eps is the span slack in edge
    # parameter space (unitless), kept tight.
    """Connected pieces of ring ∩ hull (keep_inside) or ring \\ hull.

    Weiler–Atherton restricted to a convex CCW cutter in fixed shapes: walk
    the subject ring keeping maximal runs on the requested side, then close
    each run with the hull-boundary arc between its boundary crossings —
    CCW along the hull for intersection pieces, CW for difference pieces.
    Exact when those arcs do not leave the ring (true for the slicing flow,
    whose cutters are carved at the block boundary; the host oracle is
    geometry/ops.py clip_polygon_convex / difference_convex).

    Returns (pieces (P, KV, 2), pieces_n (P,), overflow). A hull strictly
    inside the ring (difference with a hole) cannot be represented: the full
    ring is returned with overflow=True.
    """
    kv = ring.shape[0]
    kh = hull.shape[0]
    m = ring_mask(nvert, kv)
    mh = ring_mask(nh, kh)
    ha = hull
    hb = ring_next(hull, nh)
    hd = hb - ha
    hlen = jnp.maximum(jnp.linalg.norm(hd, axis=-1), 1e-12)
    # signed distance of each ring vertex to each hull plane (+ = inside):
    # f = cross(hd, v - ha) / |hd|. Subtract the plane anchor BEFORE any
    # product (translation invariance), and form the cross COMPENSATED —
    # plain f32 cancellation here both flips borderline in/out decisions
    # AND drifts the Liang-Barsky t ratios below (the residual divergence
    # class of DIVERGENCE.md).
    u = ring[:, None, :] - ha[None, :, :]
    f = cross2_compensated(hd[None, :, 0], hd[None, :, 1],
                           u[..., 0], u[..., 1]) / hlen[None, :]
    f = jnp.where(mh[None, :], f, BIG)
    fn = ring_next(f, nvert)
    v_in = jnp.all(f >= -eps, axis=1)
    v_in_nxt = ring_next(v_in, nvert)

    # Liang–Barsky span of each ring edge against the hull
    denom = f - fn
    tk = f / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    out_both = (f < -eps) & (fn < -eps)
    ent_k = (f < -eps) & (fn >= -eps)                # constraint k turns on
    exi_k = (f >= -eps) & (fn < -eps)                # constraint k turns off
    t_en = jnp.max(jnp.where(ent_k, tk, 0.0), axis=1)
    t_ex = jnp.min(jnp.where(exi_k, tk, 1.0), axis=1)
    k_en = jnp.argmax(jnp.where(ent_k, tk, -BIG), axis=1)
    k_ex = jnp.argmin(jnp.where(exi_k, tk, BIG), axis=1)
    has_span = m & ~jnp.any(out_both, axis=1) & (t_en <= t_ex + t_eps)
    nxt = ring_next(ring, nvert)
    p_en = ring + t_en[:, None] * (nxt - ring)
    p_ex = ring + t_ex[:, None] * (nxt - ring)
    entry = (~v_in) & has_span                       # edge crosses into hull
    exit_ = (~v_in_nxt) & has_span                   # edge crosses out

    # emission slots per edge: [vertex, entry point, exit point]
    ns = 3 * kv
    emit_v = m & (v_in if keep_inside else ~v_in)
    pos = jnp.stack([ring, p_en, p_ex], axis=1).reshape(ns, 2)
    emit = jnp.stack([emit_v, entry & m, exit_ & m], axis=1).reshape(ns)
    if keep_inside:
        start = jnp.stack([jnp.zeros(kv, bool), entry & m,
                           jnp.zeros(kv, bool)], axis=1).reshape(ns)
        end = jnp.stack([jnp.zeros(kv, bool), jnp.zeros(kv, bool),
                         exit_ & m], axis=1).reshape(ns)
    else:
        start = jnp.stack([jnp.zeros(kv, bool), jnp.zeros(kv, bool),
                           exit_ & m], axis=1).reshape(ns)
        end = jnp.stack([jnp.zeros(kv, bool), entry & m,
                         jnp.zeros(kv, bool)], axis=1).reshape(ns)
    plane = jnp.stack([jnp.zeros(kv, jnp.int32), k_en.astype(jnp.int32),
                       k_ex.astype(jnp.int32)], axis=1).reshape(ns)

    n_runs = jnp.sum(start)
    # cyclic order starting at the first start event
    first = jnp.argmax(start)
    okey = jnp.mod(jnp.arange(ns) - first, ns)
    skey = jnp.where(start, okey, ns + 1)
    pid = jnp.sum(jnp.where(start[None, :],
                            skey[None, :] <= okey[:, None], False),
                  axis=1) - 1
    pid = jnp.where(emit & (pid >= 0), pid, n_pieces + 1)
    rank = jnp.sum((pid[None, :] == pid[:, None])
                   & (okey[None, :] < okey[:, None]) & emit[None, :], axis=1)

    chain_len = jnp.sum(
        (pid[:, None] == jnp.arange(n_pieces)[None, :]) & emit[:, None],
        axis=0)

    # per-run boundary events: head = the run's first chain point, tail =
    # its last; both lie on the hull boundary
    def event_field(flag, val):
        onehot = flag[:, None] & (pid[:, None] == jnp.arange(n_pieces))
        return jnp.sum(jnp.where(onehot, val[:, None], 0), axis=0)

    k_head = event_field(start, plane)
    k_tail = event_field(end, plane)
    xy_head = jnp.stack([event_field(start, pos[:, 0]),
                         event_field(start, pos[:, 1])], axis=-1)
    xy_tail = jnp.stack([event_field(end, pos[:, 0]),
                         event_field(end, pos[:, 1])], axis=-1)
    run_ok = jnp.arange(n_pieces) < n_runs
    nh_s = jnp.maximum(nh, 1)
    kt = jnp.clip(k_tail, 0, kh - 1)
    khc = jnp.clip(k_head, 0, kh - 1)

    # Weiler–Atherton run linking: each run closes by walking the hull
    # boundary (CCW for intersection, CW for difference) from its tail to
    # the NEAREST head along that walk — which may belong to a different
    # run. Runs linked this way form cycles; each cycle is one connected
    # piece. Arc-length coordinates along the hull order the events.
    plane_len = jnp.where(mh, hlen, 0.0)
    cum = jnp.cumsum(plane_len) - plane_len
    L = jnp.maximum(jnp.sum(plane_len), 1e-12)
    s_tail = cum[kt] + jnp.sum((xy_tail - ha[kt]) * hd[kt], axis=-1) \
        / hlen[kt]
    s_head = cum[khc] + jnp.sum((xy_head - ha[khc]) * hd[khc], axis=-1) \
        / hlen[khc]
    if keep_inside:
        dmat = jnp.mod(s_head[None, :] - s_tail[:, None], L)
    else:
        dmat = jnp.mod(s_tail[:, None] - s_head[None, :], L)
    idx = jnp.arange(n_pieces)
    # Drop degenerate runs: a subject vertex exactly ON the hull boundary
    # whose neighbors are both on the other side generates an entry+exit
    # pair at one point — a zero-extent run that would self-link at
    # distance 0 and steal the cycle from the real runs (the touch point
    # still appears in the real piece, as a hull-arc corner).
    onehot_run = (pid[:, None] == idx[None, :]) & emit[:, None]   # (ns, P)
    ext = jnp.max(jnp.where(
        onehot_run,
        jnp.linalg.norm(pos[:, None, :] - xy_head[None, :, :], axis=-1),
        0.0), axis=0)
    diag = jnp.diagonal(dmat)
    degenerate = run_ok & (diag <= 1e-3) & (ext <= 1e-3)
    run_ok = run_ok & ~degenerate
    dmat = jnp.where(run_ok[None, :], dmat, BIG)
    # Greedy unique tail->head matching in increasing arc distance. A plain
    # per-row argmin breaks at a PINCH — a subject region touching the hull
    # boundary at a point splits into two runs whose tail/head coincide
    # there, so two tails claim the same head, sigma stops being a
    # permutation and the assembly drops a whole lobe (grid seed 103,
    # DIVERGENCE.md round 5). Greedy gives the 0-distance pinch link its
    # head first and forces the displaced run onto the next head along the
    # walk — the 2-cycle that assembles the host's bridged single ring
    # (host _difference_pieces keeps point-connected components together,
    # plan_client.py:918-933). In non-degenerate position each tail's
    # nearest head is unique and this reduces to the old argmin.
    sigma = idx
    row_done = ~run_ok
    col_used = ~run_ok
    for _ in range(n_pieces):
        cost = jnp.where(row_done[:, None] | col_used[None, :], BIG, dmat)
        flat = jnp.argmin(cost)
        r = flat // n_pieces
        h = flat % n_pieces
        ok = cost.reshape(-1)[flat] < BIG
        sigma = jnp.where(ok & (idx == r), h, sigma)
        row_done = row_done | (ok & (idx == r))
        col_used = col_used | (ok & (idx == h))

    # hull corners on the closing arc from tail(r) to head(sigma(r))
    k_head_s = k_head[sigma]
    xy_head_s = xy_head[sigma]
    s_along = jnp.sum((xy_head_s - xy_tail) * hd[kt], axis=-1)
    if keep_inside:
        count = jnp.mod(k_head_s - k_tail, nh_s)
        direct = s_along >= 0
        c_idx = jnp.mod(k_tail[:, None] + 1 + jnp.arange(kh)[None, :], nh_s)
    else:
        count = jnp.mod(k_tail - k_head_s, nh_s)
        direct = s_along <= 0
        c_idx = jnp.mod(k_tail[:, None] - jnp.arange(kh)[None, :], nh_s)
    same = (count == 0) & ~direct
    count = jnp.where(same, nh_s, count)
    # pinch link: tail and linked head are the SAME point but sit at a hull
    # corner, registered on the corner's two different planes — the
    # plane-index arithmetic above then reads a near-full hull walk where
    # the true closing arc has zero length and no corners
    pinch = jnp.linalg.norm(xy_head_s - xy_tail, axis=-1) <= 1e-3
    count = jnp.where(pinch, 0, count)
    count = jnp.where(run_ok, count, 0)

    # cycles of sigma: representative = min run index reachable; emission
    # offset = total output of the runs walked from the representative
    rep = idx
    it = idx
    for _ in range(n_pieces):
        it = sigma[it]
        rep = jnp.minimum(rep, it)
    run_total = chain_len + count
    off = jnp.zeros(n_pieces, jnp.int32)
    cur = rep
    for _ in range(n_pieces):
        not_done = cur != idx
        off = off + jnp.where(not_done, run_total[cur], 0)
        cur = jnp.where(not_done, sigma[cur], cur)
    is_rep = run_ok & (rep == idx)
    piece_total = jnp.sum(
        jnp.where((rep[None, :] == idx[:, None]) & run_ok[None, :],
                  run_total[None, :], 0), axis=1)
    pieces_n = jnp.where(is_rep, piece_total, 0)

    # place subject chains at their per-run offsets inside their piece;
    # flattened one-hot contraction instead of a 2D scatter (TPU scatters
    # serialize) — sentinel rows/cols land in the padding row/columns and
    # are sliced away below
    P2 = n_pieces + 2
    KW = kv + 2
    pid_c = jnp.clip(pid, 0, n_pieces - 1)
    sc_p = jnp.where(emit & (pid < n_pieces), rep[pid_c], n_pieces + 1)
    sc_r = rank + off[pid_c]
    sc_r = jnp.where(emit & (sc_r < kv), sc_r, kv + 1)
    flat1 = sc_p * KW + jnp.minimum(sc_r, kv + 1)

    corner = hull[c_idx]                              # (P, KH, 2)
    c_valid = (jnp.arange(kh)[None, :] < count[:, None]) & run_ok[:, None]
    c_pos = (off + chain_len)[:, None] + jnp.arange(kh)[None, :]
    sc_cp = jnp.where(c_valid & (c_pos < kv), c_pos, kv + 1)
    rep_b = jnp.broadcast_to(rep[:, None], sc_cp.shape)
    flat2 = rep_b.reshape(-1) * KW + jnp.minimum(sc_cp.reshape(-1), kv + 1)

    flat = onehot_place(pos, flat1, jnp.ones_like(flat1, bool), P2 * KW) + \
        onehot_place(corner.reshape(-1, 2), flat2,
                     jnp.ones_like(flat2, bool), P2 * KW)
    pieces = flat.reshape(P2, KW, 2)[:, :kv]

    overflow = (n_runs > n_pieces) | jnp.any(pieces_n > kv)

    # no-crossing global cases
    any_out = jnp.any(m & ~v_in)
    all_out = jnp.all(~v_in | ~m)
    hc = jnp.sum(jnp.where(mh[:, None], hull, 0.0), axis=0) / nh_s
    hull_in_ring = point_in_ring(hc, ring, nvert)
    no_ev = n_runs == 0
    if keep_inside:
        # ring inside hull -> ring; hull inside ring -> hull; disjoint -> 0
        take_ring = no_ev & ~any_out
        take_hull = no_ev & all_out & hull_in_ring
        p0 = jnp.where(take_ring, jnp.pad(ring, ((0, 0), (0, 0))),
                       pieces[0])
        hpad = jnp.zeros((kv, 2), ring.dtype).at[:kh].set(hull)
        p0 = jnp.where(take_hull, hpad, p0)
        n0 = jnp.where(take_ring, nvert,
                       jnp.where(take_hull, nh, pieces_n[0]))
        pieces = pieces.at[0].set(p0)
        pieces_n = pieces_n.at[0].set(n0)
    else:
        # disjoint (or hull-hole) -> ring; ring inside hull -> 0 pieces
        take_ring = no_ev & any_out
        pieces = pieces.at[0].set(jnp.where(take_ring, ring, pieces[0]))
        pieces_n = pieces_n.at[0].set(jnp.where(take_ring, nvert,
                                                pieces_n[0]))
        overflow = overflow | (no_ev & any_out & hull_in_ring)

    pieces = pieces[:n_pieces]
    pieces_n = pieces_n[:n_pieces]
    pieces, pieces_n = jax.vmap(dedupe_ring)(pieces, pieces_n)
    return pieces, pieces_n, overflow


def dp_simplify_ring(ring: jnp.ndarray, nvert: jnp.ndarray, tol):
    """Faithful jit Douglas–Peucker ring simplify (host oracle:
    geometry/ops.py simplify_ring_dp; reference GEOS simplify,
    plan_client.py:473-512).

    Matches the host exactly: the ring is rotated to start at its extreme
    vertex (max distance from the closed-ring vertex mean) and anchored
    there and at the opposite mid vertex; then, per chord between
    consecutive kept vertices, the farthest vertex beyond tol is added —
    the chord-parallel formulation of recursive DP (every pass splits all
    violating chords at once, so KV passes reach the same fixpoint).
    Rings with <= 4 vertices pass through; results that collapse below 3
    vertices fall back to the input. Output is rotated to start at the
    anchor, like the host. Returns (out_ring, out_nvert)."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    n = jnp.maximum(nvert, 1)
    pos = jnp.arange(kv)
    # host: closed = vstack([ring, ring[:1]]), mean over the n+1 rows
    cmean = (jnp.sum(jnp.where(m[:, None], ring, 0.0), axis=0) + ring[0]) \
        / (n + 1)
    dc = jnp.where(m, jnp.linalg.norm(ring - cmean, axis=-1), -1.0)
    start = jnp.argmax(dc)
    # rotate so the anchor is vertex 0 (one-hot matmul, gather-free)
    src = jnp.mod(start + pos, n)
    onehot = (src[:, None] == pos[None, :]) & m[None, :]
    rr = jnp.sum(jnp.where(onehot[:, :, None], ring[None, :, :], 0.0),
                 axis=1)

    mid = (n + 1) // 2
    kept0 = (pos == 0) | (pos == mid)

    def body(_, kept):
        kept_m = kept & m
        pk = jax.lax.cummax(jnp.where(kept_m, pos, -1))
        nk = jax.lax.cummin(jnp.where(kept_m, pos, 2 * kv)[::-1])[::-1]
        # positions after the last kept close against rolled index n == 0.
        # one-hot selects, not rr[indices]: these two gathers, unrolled
        # kv times, were 40 x 0.14 ms = 5.4 ms/step of the rollout profile
        # (TPU element gathers run through a serial custom call)
        oh_a = jnp.clip(pk, 0, kv - 1)[:, None] == pos[None, :]
        a = jnp.sum(jnp.where(oh_a[:, :, None], rr[None, :, :], 0.0),
                    axis=1)
        oh_b = jnp.clip(nk, 0, kv - 1)[:, None] == pos[None, :]
        bg = jnp.sum(jnp.where(oh_b[:, :, None], rr[None, :, :], 0.0),
                     axis=1)
        b = jnp.where((nk >= kv)[:, None], rr[0], bg)
        d = point_segment_distance(rr, a, b)
        cand = m & ~kept_m & (pos < n)
        d = jnp.where(cand, d, -1.0)
        same_chord = pk[None, :] == pk[:, None]
        chord_max = jnp.max(jnp.where(same_chord, d[None, :], -1.0), axis=1)
        earlier_ge = jnp.any(same_chord & (pos[None, :] < pos[:, None])
                             & (d[None, :] >= d[:, None]), axis=1)
        winner = cand & (d > tol) & (d >= chord_max) & ~earlier_ge
        return kept | winner

    # unrolled (kv is small and static): a lax.fori_loop here costs a
    # device loop sync per iteration, which dominates the tiny body
    kept = kept0
    for _ in range(kv):
        kept = body(0, kept)
    kept = kept & m
    # compact in rolled order, then consecutive-duplicate cleanup
    counts = kept.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    out = onehot_place(rr, offsets, kept, kv)
    nkeep = jnp.sum(counts)
    out, nkeep = dedupe_ring(out, nkeep)
    passthrough = (nvert <= 4) | (nkeep < 3)
    return (jnp.where(passthrough, ring, out),
            jnp.where(passthrough, nvert, nkeep))


def insert_points_on_ring(ring: jnp.ndarray, nvert: jnp.ndarray,
                          pts: jnp.ndarray, alive: jnp.ndarray, tol,
                          max_insert: int = 8):
    """Insert alive points lying on ring edges (within tol, strictly between
    the endpoints) as new vertices, in order along each edge — the jit
    mirror of the host snap's insert step (geometry/ops.py
    _insert_on_segments; reference GEOS snap, plan_client.py:473-512).

    Returns (out_ring, out_nvert, overflow)."""
    kv = ring.shape[0]
    npt = pts.shape[0]
    m = ring_mask(nvert, kv)
    a = ring
    b = ring_next(ring, nvert)
    d = point_segment_distance(pts[None, :, :], a[:, None], b[:, None])
    near_a = jnp.linalg.norm(pts[None, :, :] - a[:, None], axis=-1) <= tol
    near_b = jnp.linalg.norm(pts[None, :, :] - b[:, None], axis=-1) <= tol
    hit = m[:, None] & alive[None, :] & (d <= tol) & ~near_a & ~near_b
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.sum((pts[None, :, :] - a[:, None, :]) * ab[:, None, :],
                axis=-1) / denom[:, None]

    flat_hit = hit.reshape(-1)
    n_ins = jnp.sum(flat_hit)
    overflow = (n_ins > max_insert) | (nvert + n_ins > kv)
    edge_of = jnp.broadcast_to(jnp.arange(kv)[:, None], (kv, npt)).reshape(-1)
    t_of = t.reshape(-1)
    pos_of = jnp.broadcast_to(pts[None, :, :], (kv, npt, 2)).reshape(-1, 2)
    vals = jnp.concatenate([edge_of[:, None].astype(jnp.float32),
                            t_of[:, None].astype(jnp.float32), pos_of],
                           axis=1)
    cand = rank_compact(flat_hit, vals, max_insert)   # (I, 4)
    c_ok = jnp.arange(max_insert) < jnp.minimum(n_ins, max_insert)
    c_edge = cand[:, 0].astype(jnp.int32)
    c_t = cand[:, 1]
    c_pos = cand[:, 2:4]
    # output index: vertices shift by the candidates on earlier edges;
    # candidates order by (edge, t, slot)
    v_out = jnp.arange(kv) + jnp.sum(
        jnp.where(c_ok[None, :], c_edge[None, :] < jnp.arange(kv)[:, None],
                  False), axis=1)
    before = (c_edge[None, :] < c_edge[:, None]) | \
        ((c_edge[None, :] == c_edge[:, None])
         & ((c_t[None, :] < c_t[:, None])
            | ((c_t[None, :] == c_t[:, None])
               & (jnp.arange(max_insert)[None, :]
                  < jnp.arange(max_insert)[:, None]))))
    c_out = c_edge + 1 + jnp.sum(jnp.where(c_ok[None, :], before, False),
                                 axis=1)
    # one-hot matmul placement instead of .at[].set: under the rollout's
    # vmap(B) x vmap(NP) this scatter lowered to a serial per-row loop on
    # TPU (profiled at ~90 ms/step for the neighbor-snap pass alone); the
    # (kv, kv) / (kv, I) one-hot contractions vectorize fully, and each
    # output row has at most one contributor so the sum is exact.
    sel = jnp.arange(kv)
    oh_v = (jnp.where(m, v_out, kv + 1)[None, :] == sel[:, None])
    oh_c = (jnp.where(c_ok, c_out, kv + 1)[None, :] == sel[:, None])
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum('oi,id->od', oh_v.astype(ring.dtype), ring,
                     precision=hp) \
        + jnp.einsum('oi,id->od', oh_c.astype(ring.dtype), c_pos,
                     precision=hp)
    return out, jnp.minimum(nvert + n_ins, kv), overflow


def rank_compact(flags: jnp.ndarray, values: jnp.ndarray,
                 out_size: int) -> jnp.ndarray:
    """out[j] = values[p] for the p with rank j among flagged positions.

    TPU-native compaction: ranks from a cumsum are nondecreasing, so the
    gather-by-rank is a SORTED segment-sum — the one scatter form TPUs
    execute vectorized (sorts/searchsorted/unsorted scatters all serialize).
    values: (n,) or (n, d) numeric; positions beyond the flagged count give 0.
    """
    r = jnp.cumsum(flags.astype(jnp.int32)) - 1
    onehot = flags[:, None] & (r[:, None] == jnp.arange(out_size)[None, :])
    squeeze = values.ndim == 1
    v = values[:, None] if squeeze else values
    n, d = v.shape
    if out_size * n * d <= _OH_SELECT_MAX:
        # masked select+sum on the VPU (see onehot_place): tiny f32-HIGHEST
        # dots are MXU-latency-bound at ~140 us apiece
        out = jnp.sum(jnp.where(onehot.T[:, :, None], v[None, :, :], 0),
                      axis=1).astype(values.dtype)
    else:
        # TPU matmuls default to bf16 passes; index values exceed bf16's
        # integer range, so force full f32 precision (exact for ints <
        # 2^24). The accumulator keeps the input's width (f64 stays f64
        # under x64 test runs, where 1e-9-exact coordinates matter).
        acc = jnp.float64 if values.dtype == jnp.float64 else jnp.float32
        out = jnp.einsum('no,nd->od', onehot.astype(acc), v.astype(acc),
                         preferred_element_type=acc,
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(values.dtype)
    return out[:, 0] if squeeze else out
