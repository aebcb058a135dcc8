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


def ring_mask(nvert: jnp.ndarray, kv: int) -> jnp.ndarray:
    """(KV,) bool mask of valid vertices."""
    return jnp.arange(kv) < nvert


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
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    nxt = ring_next(ring, nvert)
    cross = ring[:, 0] * nxt[:, 1] - nxt[:, 0] * ring[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(m, cross, 0.0)))


def ring_signed_area(ring: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    nxt = ring_next(ring, nvert)
    cross = ring[:, 0] * nxt[:, 1] - nxt[:, 0] * ring[:, 1]
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
    nxt = ring_next(ring, nvert)
    cross = ring[:, 0] * nxt[:, 1] - nxt[:, 0] * ring[:, 1]
    cross = jnp.where(m, cross, 0.0)
    a = jnp.sum(cross) / 2.0
    cx = jnp.sum((ring[:, 0] + nxt[:, 0]) * cross) / 6.0
    cy = jnp.sum((ring[:, 1] + nxt[:, 1]) * cross) / 6.0
    safe = jnp.abs(a) > 1e-9
    mean = jnp.sum(jnp.where(m[:, None], ring, 0.0), axis=0) / \
        jnp.maximum(nvert, 1)
    return jnp.where(safe, jnp.stack([cx, cy]) / jnp.where(safe, a, 1.0), mean)


def ring_bounds(ring: jnp.ndarray, nvert: jnp.ndarray) -> jnp.ndarray:
    """(4,) minx, miny, maxx, maxy over valid vertices."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)[:, None]
    lo = jnp.min(jnp.where(m, ring, BIG), axis=0)
    hi = jnp.max(jnp.where(m, ring, -BIG), axis=0)
    return jnp.concatenate([lo, hi])


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
    nrm = jnp.stack([-d[1], d[0]])
    nrm = jnp.where(keep_left, nrm, -nrm)
    m = ring_mask(nvert, kv)
    side = jnp.einsum('kd,d->k', ring - a, nrm)
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

    out = jnp.zeros((2 * kv, 2), dtype=ring.dtype)
    # non-emitting rows scatter to index 2*kv, dropped by mode='drop'
    idx_cur = jnp.where(emit_cur, offsets, 2 * kv)
    out = out.at[idx_cur].set(ring, mode='drop')
    idx_cross = jnp.where(emit_cross, offsets + emit_cur.astype(jnp.int32),
                          2 * kv)
    out = out.at[idx_cross].set(cross_pt, mode='drop')
    overflow = total > kv
    out_ring = out[:kv]
    out_nvert = jnp.minimum(total, kv)
    return out_ring, out_nvert, overflow


def dedupe_ring(ring: jnp.ndarray, nvert: jnp.ndarray, tol: float = 1e-7):
    """Drop consecutive near-duplicate vertices (masked compaction)."""
    kv = ring.shape[0]
    m = ring_mask(nvert, kv)
    dup = jnp.linalg.norm(ring - ring_prev(ring, nvert), axis=-1) <= tol
    keep = m & (~dup | (jnp.arange(kv) == 0))
    counts = keep.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    out = jnp.zeros_like(ring)
    idx = jnp.where(keep, offsets, kv - 1)
    out = out.at[idx].set(jnp.where(keep[:, None], ring, 0.0), mode='drop')
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
