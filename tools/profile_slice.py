"""Sub-component ablation of apply_land_use on the attached device.

Times vmapped+scanned slices of the land-use step pipeline to locate the
hot spots of the branch-complete slicer. Usage:
  python tools/profile_slice.py [B] [T]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3, label=''):
    try:
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
    except Exception as e:
        print(f'{label:40s} FAILED: {type(e).__name__}: {str(e)[:100]}')
        return None
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    print(f'{label:40s} {best*1000:9.1f} ms')
    return best


def main():
    from urban_tpu.utils.config import Config
    from urban_tpu.envs.plan_client import PlanClient
    from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
    from urban_tpu.jaxenv.rollout import broadcast_state
    from urban_tpu.jaxenv import step as js
    from urban_tpu.jaxenv import slicer as jsl
    from urban_tpu.jaxenv import geometry as jg

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    cfg = Config('hlg', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    caps = dict(KV=20, NP=256, NS=512, NPT=320, NE=2304)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length,
                         caps=caps)
    init_state = build_initial_state(spec, plc)
    sb = broadcast_state(init_state, B)
    a0 = jnp.zeros(B, jnp.int32)

    def scan_over(fn):
        @jax.jit
        def run(states):
            def body(c, _):
                # thread the carry into the input so the body is NOT
                # loop-invariant (XLA would hoist it out of the scan)
                st = states.replace(pt_flat=states.pt_flat + c * 1e-30)
                out = jax.vmap(fn)(st)
                leaves = jax.tree.leaves(out)
                acc = sum(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:1])
                          for l in leaves)
                return c + acc * 1e-30, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=T)
            return out
        return run

    c = js._consts(spec)
    cell = spec.cell_edge_length

    def pick(state):
        t = js.pending_land_use_type(spec, state)
        e = state.edge[0]
        p = jnp.where(e[0] < spec.NP, e[0], e[1]).astype(jnp.int32)
        q = (e[0] + e[1] - p).astype(jnp.int32) - spec.NP - spec.NS
        return t, state.poly_ring[p], state.poly_nvert[p], state.pt[q]

    def f_cutter(state):
        t, ring, nv, X = pick(state)
        lp = js._lu_params(spec, c, t)
        return jsl.compute_cutter(ring, nv, X, state.pt, state.pt_alive, lp)

    def f_arc_in(state):
        t, ring, nv, X = pick(state)
        lp = js._lu_params(spec, c, t)
        S, snv, cut, sf = jsl.compute_cutter(ring, nv, X, state.pt,
                                             state.pt_alive, lp)
        cut4, nh4 = jg.convex_hull_masked(cut, jnp.ones(4, bool))
        return jg.arc_pieces(S, snv, cut4, nh4, keep_inside=True)

    def f_simplify(state):
        t, ring, nv, X = pick(state)
        return js.simplify_snap_poly(ring, nv, state.pt, state.pt_alive,
                                     1.0 / cell)

    def f_simplify5(state):
        t, ring, nv, X = pick(state)
        rings = jnp.broadcast_to(ring[None], (5,) + ring.shape)
        nvs = jnp.broadcast_to(nv[None], (5,))
        return jax.vmap(lambda r, n: js.simplify_snap_poly(
            r, n, state.pt, state.pt_alive, 1.0 / cell))(rings, nvs)

    def f_insert_nb(state):
        new_pts = state.pt[:js.MAX_NEW_PTS]
        pv = jnp.ones(js.MAX_NEW_PTS, bool)
        return jax.vmap(lambda r, n: jg.insert_points_on_ring(
            r, n, new_pts, pv, js.EPS, max_insert=js.MAX_NEW_PTS))(
                state.poly_ring, state.poly_nvert)

    def f_alu(state):
        return js.apply_land_use(spec, state, jnp.asarray(0))

    def f_gaps(state):
        t, ring, nv, X = pick(state)
        return js.collinear_boundary_gaps(ring, nv, state.seg,
                                          state.seg_alive)

    def f_contig(state):
        ids = jnp.arange(5, dtype=jnp.int32)
        pt_ids = jnp.arange(js.MAX_NEW_PTS, dtype=jnp.int32)
        seg_ids = jnp.arange(32, dtype=jnp.int32)
        killed = jnp.full(9, -1, jnp.int32)
        return js.update_contiguity(spec, state, ids, pt_ids + spec.NP
                                    + spec.NS, seg_ids + spec.NP, killed)

    def f_freeslots(state):
        s1 = js.free_slots(state.pt_alive, js.MAX_NEW_PTS)
        s2 = js.free_slots(state.seg_alive, 24)
        s3 = js.free_slots(state.poly_alive, js.N_NEW_POLY)
        return s1, s2, s3

    def f_metrics(state):
        t, ring, nv, X = pick(state)
        rings = jnp.broadcast_to(ring[None], (5,) + ring.shape)
        nvs = jnp.broadcast_to(nv[None], (5,))
        return (jax.vmap(js.ring_shape_metrics)(rings, nvs),
                jax.vmap(js.ring_feat8)(rings, nvs))

    timeit(scan_over(f_cutter), sb, label='compute_cutter')
    timeit(scan_over(f_arc_in), sb, label='cutter + hull + arc_pieces(in)')
    timeit(scan_over(f_simplify), sb, label='simplify_snap_poly x1')
    timeit(scan_over(f_simplify5), sb, label='simplify_snap_poly x5 (vmap)')
    timeit(scan_over(f_insert_nb), sb, label='neighbor insert_points (NP vmap)')
    def mk5(fn):
        def run(state):
            t, ring, nv, X = pick(state)
            rings = jnp.broadcast_to(ring[None], (5,) + ring.shape)
            nvs = jnp.broadcast_to(nv[None], (5,))
            return jax.vmap(fn, in_axes=(0, 0, None))(rings, nvs, state)
        return run

    timeit(scan_over(mk5(lambda r, n, s: jg.canonicalize_ring(r, n))), sb,
           label='  canonicalize x5')
    timeit(scan_over(mk5(lambda r, n, s: jg.dp_simplify_ring(r, n, 1.0))),
           sb, label='  dp_simplify x5')
    timeit(scan_over(mk5(lambda r, n, s: js.distance_simplify_ring(
        r, n, js.EPS))), sb, label='  distance_simplify x5')
    timeit(scan_over(mk5(lambda r, n, s: js.snap_ring_to_points(
        r, n, s.pt, s.pt_alive, 1.0))), sb, label='  snap_ring x5')
    timeit(scan_over(mk5(lambda r, n, s: jg.insert_points_on_ring(
        r, n, s.pt[:8], jnp.ones(8, bool), 1.0))), sb,
           label='  insert_points x5')
    timeit(scan_over(mk5(lambda r, n, s: jg.dedupe_ring(r, n))), sb,
           label='  dedupe x5')
    timeit(scan_over(f_gaps), sb, label='collinear_boundary_gaps')
    timeit(scan_over(f_contig), sb, label='update_contiguity')
    timeit(scan_over(f_freeslots), sb, label='free_slots x3')
    timeit(scan_over(f_metrics), sb, label='shape metrics + feat8 x5')
    timeit(scan_over(f_alu), sb, label='apply_land_use full')


if __name__ == '__main__':
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    main()
