"""Diagnose a single divergent lockstep seed: replay to the divergence
step, then dump both engines' state around it (plan counts, chosen action,
parcel result, failure codes, new-intersection bookkeeping).

Usage: JAX_PLATFORMS=cpu python tools/diverge_debug.py <seed> [scenario]
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger('divergence')
logger.addHandler(logging.StreamHandler(sys.stdout))
logger.setLevel(logging.DEBUG)
logger.propagate = False


def main(seed: int, scenario: str = 'hlg'):
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from urban_tpu import city_config
    from urban_tpu.utils.config import Config
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.envs.plan_client import PlanClient
    from urban_tpu.jaxenv import step as js
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
    prev_exist = plc._table.existence.copy()
    prev_alive = np.asarray(state.poly_alive).copy()
    for step in range(60):
        if env._stage != 'land_use':
            print(f'step {step}: reached stage {env._stage}, stopping')
            break
        valid = np.nonzero(obs[6])[0]
        if len(valid) == 0:
            break
        t = js.pending_land_use_type(spec, state)
        jit_mask = np.asarray(js.land_use_mask(spec, state, t))
        n_h, n_j = len(valid), int(jit_mask.sum())
        if n_h != n_j:
            print(f'step {step}: MASK DRIFT host={n_h} jit={n_j} — dumping '
                  f'geometry added by the previous step')
            _dump_added(plc, state, prev_exist, prev_alive)
            return
        prev_exist = plc._table.existence.copy()
        prev_alive = np.asarray(state.poly_alive).copy()
        action = int(rng.choice(valid))
        centroid, inter_xy = _host_action_identity(plc, action)
        jax_action, err = _jax_matching_edge(spec, state, centroid,
                                             inter_xy, t)
        print(f'step {step}: type={int(t)} host_mask={n_h} jit_mask={n_j} '
              f'action={action} jax_action={jax_action} match_err={err}')
        if jax_action is None:
            print('  -> host action NOT representable in jit mask')
            _dump(plc, spec, state, centroid, inter_xy)
            return
        pre_counts = plc.get_plan_ratio_and_count()[1].copy()
        obs, r_host, done_host, info_host = env.step(
            np.array([action, 0], dtype=float), logger)
        state, r_jax, done_jax, info_jax = step_fn(
            state, jnp.asarray([jax_action, 0], dtype=jnp.int32))
        fail_host = bool(done_host) and \
            float(r_host) == float(env.FAILURE_REWARD)
        fail_jax = bool(info_jax['failure'])
        print(f'    r_host={float(r_host):.4f} done_host={bool(done_host)} '
              f'fail_host={fail_host} | r_jax={float(r_jax):.4f} '
              f'done_jax={bool(done_jax)} fail_jax={fail_jax} '
              f'code={int(np.asarray(info_jax.get("failure_code", 0))):#x}')
        counts_h = plc.get_plan_ratio_and_count()[1]
        counts_j = np.asarray(state.plan_count)
        if fail_jax != fail_host:
            print(f'  -> FAILURE MISMATCH host={fail_host} jit={fail_jax} '
                  f'jit_code={int(info_jax.get("failure_code", 0)):#x}')
            names = {b: n for b, n in js.FAILURE_BIT_NAMES.items()}
            code = int(info_jax.get('failure_code', 0))
            on = [n for b, n in names.items() if code & b]
            print(f'  jit failure bits: {on}')
            print(f'  host placed: counts {pre_counts} -> {counts_h}')
            _dump(plc, spec, state, centroid, inter_xy)
            return
        if not np.array_equal(counts_h, counts_j):
            print(f'  -> COUNT MISMATCH')
            print(f'     pre : {pre_counts}')
            print(f'     host: {counts_h}')
            print(f'     jit : {counts_j}')
            diff = np.nonzero(counts_h != counts_j)[0]
            print(f'     differing types: {diff}')
            _dump(plc, spec, state, centroid, inter_xy)
            return
        if done_host or bool(done_jax):
            print(f'  episode done host={bool(done_host)} '
                  f'jit={bool(done_jax)} r_host={float(r_host):.4f} '
                  f'r_jax={float(r_jax):.4f}')
            break
    print('no divergence within horizon')


def _dump_added(plc, state, prev_exist, prev_alive):
    """Print every feature that appeared in each engine since the snapshot
    (the geometry produced by the previous step's placement)."""
    tb = plc._table
    if len(prev_exist) < len(tb.existence):  # host table grows on placement
        prev_exist = np.concatenate(
            [prev_exist, np.zeros(len(tb.existence) - len(prev_exist),
                                  dtype=bool)])
    new_h = np.nonzero(tb.existence & ~prev_exist)[0]
    print('  host features added:')
    for i in new_h:
        g = tb.geoms[i]
        print(f'    id={i} type={tb.types[i]} kind={g.kind} '
              f'area={g.area:.2f} coords={np.asarray(g.coords).tolist()}')
    alive_j = np.asarray(state.poly_alive)
    new_j = np.nonzero(alive_j & ~prev_alive)[0]
    ring = np.asarray(state.poly_ring)
    nv = np.asarray(state.poly_nvert)
    tj = np.asarray(state.poly_type)
    print('  jit polys added:')
    for i in new_j:
        print(f'    slot={i} type={tj[i]} nverts={nv[i]} '
              f'coords={ring[i, :nv[i]].tolist()}')
    # segments/points added (boundary bookkeeping drives the action mask)
    seg = np.asarray(state.seg)
    seg_alive = np.asarray(state.seg_alive)
    print(f'  jit alive segs={int(seg_alive.sum())} '
          f'pts={int(np.asarray(state.pt_alive).sum())}')
    nseg_h = int(np.count_nonzero(tb.existence
                                  & np.isin(tb.types, (3, 11, 12))))
    npt_h = int(np.count_nonzero(tb.existence & (tb.types == 13)))
    print(f'  host alive boundary/road-like rows={nseg_h} '
          f'intersections={npt_h}')


def _dump(plc, spec, state, centroid, inter_xy):
    from urban_tpu import city_config
    print(f'  action identity: block centroid {centroid}, '
          f'intersection {inter_xy}')
    tb = plc._table
    alive = np.nonzero(tb.existence)[0]
    # host blocks nearest the acted centroid
    cents = np.array([np.asarray(tb.geoms[i].centroid) for i in alive])
    d = np.linalg.norm(cents - np.asarray(centroid), axis=1)
    order = np.argsort(d)[:6]
    print('  host features nearest acted centroid:')
    for k in order:
        i = alive[k]
        g = tb.geoms[i]
        print(f'    id={i} type={tb.types[i]} d={d[k]:.3f} area={g.area:.3f} '
              f'kind={g.kind} nverts={len(g.coords)}')
    # jit polygons nearest
    poly_xy = np.asarray(state.poly_ring)
    poly_n = np.asarray(state.poly_nvert)
    alive_j = np.nonzero(np.asarray(state.poly_alive))[0]
    cj = np.array([poly_xy[i, :poly_n[i]].mean(0) for i in alive_j])
    dj = np.linalg.norm(cj - np.asarray(centroid), axis=1)
    oj = np.argsort(dj)[:6]
    print('  jit polys nearest acted centroid:')
    types_j = np.asarray(state.poly_type)
    for k in oj:
        i = alive_j[k]
        print(f'    slot={i} type={types_j[i]} d={dj[k]:.3f} '
              f'nverts={poly_n[i]}')


if __name__ == '__main__':
    main(int(sys.argv[1]), sys.argv[2] if len(sys.argv) > 2 else 'hlg')
