"""Replay a seeded lockstep episode to step K, then run the jit engine's
land-use placement internals EAGERLY on the acted edge and print every
intermediate (cutter, parcel, difference pieces) next to the host result.

Usage: JAX_PLATFORMS=cpu python tools/placement_probe.py <seed> <scenario> <K>
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger('divergence')
logger.addHandler(logging.NullHandler())
logger.propagate = False


def main(seed: int, scenario: str, k: int):
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from urban_tpu.utils.config import Config
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.envs.plan_client import PlanClient
    from urban_tpu.jaxenv import step as js
    from urban_tpu.jaxenv import geometry as jg
    from urban_tpu.jaxenv import slicer as jsl
    from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
    from tests.test_lockstep_episode import (_host_action_identity,
                                             _jax_matching_edge)

    cfg = Config(scenario, 0, tmp=True)
    env = CityEnv(cfg)
    obs = env.reset()
    plc = env._plc
    plc2 = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc2, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc2)
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))

    rng = np.random.default_rng(seed)
    for step in range(k + 1):
        valid = np.nonzero(obs[6])[0]
        t = js.pending_land_use_type(spec, state)
        action = int(rng.choice(valid))
        centroid, inter_xy = _host_action_identity(plc, action)
        jax_action, err = _jax_matching_edge(spec, state, centroid,
                                             inter_xy, t)
        if step < k:
            obs, *_ = env.step(np.array([action, 0], dtype=float), logger)
            state, *_ = step_fn(
                state, jnp.asarray([jax_action, 0], dtype=jnp.int32))
            continue

        # ---- step K: run the placement internals eagerly ----
        print(f'step {k}: type={int(t)} host_action={action} '
              f'jit_edge={jax_action}')
        a = jax_action
        c = js._consts(spec)
        e = state.edge[a]
        e0_is_poly = e[0] < spec.NP
        p = int(jnp.where(e0_is_poly, e[0], e[1]))
        qg = int(e[0] + e[1]) - p
        q = qg - spec.NP - spec.NS
        ring = state.poly_ring[p]
        nv = state.poly_nvert[p]
        X = state.pt[q]
        kvp = ring.shape[0]
        print(f'  block slot={p} nv={int(nv)} '
              f'ring={np.asarray(ring)[:int(nv)].tolist()}')
        print(f'  intersection X={np.asarray(X).tolist()}')
        lp = js._lu_params(spec, c, int(t))
        S, snv, cut, slice_fail = jsl.compute_cutter(
            ring, nv, X, state.pt, state.pt_alive, lp)
        print(f'  cutter cut4={np.asarray(cut).tolist()} '
              f'slice_fail={bool(slice_fail)}')
        cut4, nh4 = jg.convex_hull_masked(cut, jnp.ones(4, bool))
        in_r, in_n, ovf_in = jg.arc_pieces(S, snv, cut4, nh4,
                                           keep_inside=True)
        in_area = jax.vmap(jg.ring_area)(in_r, in_n)
        imax = int(jnp.argmax(in_area))
        parcel0, parcel_n0 = in_r[imax], in_n[imax]
        print(f'  parcel nv={int(parcel_n0)} area={float(in_area[imax]):.3f}'
              f' ring={np.asarray(parcel0)[:int(parcel_n0)].tolist()}')
        hull_p, nh_p = jg.convex_hull_masked(parcel0,
                                             jg.ring_mask(parcel_n0, kvp))
        print(f'  parcel hull nh={int(nh_p)} '
              f'{np.asarray(hull_p)[:int(nh_p)].tolist()}')
        out_r, out_n, ovf_out = jg.arc_pieces(ring, nv, hull_p, nh_p,
                                              keep_inside=False)
        out_area = jax.vmap(jg.ring_area)(out_r, out_n)
        print(f'  difference pieces (ovf={bool(ovf_out)}):')
        for i in range(out_r.shape[0]):
            n_i = int(out_n[i])
            if n_i == 0:
                continue
            print(f'    piece {i}: nv={n_i} area={float(out_area[i]):.3f} '
                  f'{np.asarray(out_r[i])[:n_i].tolist()}')
        snap_tol = 1.0 / spec.cell_edge_length
        pieces_r, pieces_n, piece_pfail = jax.vmap(
            js.simplify_snap_poly, in_axes=(0, 0, None, None, None))(
                out_r, out_n, state.pt, state.pt_alive, snap_tol)
        print('  after simplify_snap:')
        for i in range(pieces_r.shape[0]):
            n_i = int(pieces_n[i])
            if n_i == 0:
                continue
            print(f'    piece {i}: nv={n_i} pfail={bool(piece_pfail[i])} '
                  f'{np.asarray(pieces_r[i])[:n_i].tolist()}')

        # host placement for comparison
        obs, r_h, d_h, _ = env.step(np.array([action, 0], dtype=float),
                                    logger)
        tb = plc._table
        alive = np.nonzero(tb.existence)[0]
        print('  host newest rows:')
        for i in alive[-4:]:
            g = tb.geoms[i]
            print(f'    id={i} type={tb.types[i]} kind={g.kind} '
                  f'area={g.area:.2f} '
                  f'coords={np.asarray(g.coords).tolist()}')
        return


if __name__ == '__main__':
    main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))
