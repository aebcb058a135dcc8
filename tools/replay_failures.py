"""Replay jit-policy-driven FAILING bench episodes through the host oracle.

The headline bench (bench.py) reports episode failures; this harness decides
whether each failure is *fidelity* (the host engine fails the same action at
the same step — the reference's geometry-failure path, reference
city.py:450-457) or a jit-side artifact (capacity overflow or a mask bug
admitting an action the host would reject or survive).

Method: rerun the bench rollout (identical model/params/rng), recording the
per-step actions instead of discarding them; for every failure event walk
back to the episode's reset, then drive BOTH a fresh single-env jit episode
and a fresh host CityEnv with those actions, mapping jit slot actions to
host graph actions by feature geometry (block centroid + intersection xy for
land-use edges, segment midpoint for road nodes).

Usage: python tools/replay_failures.py [max_episodes] [--roomy]
Prints one classification line per failure and a summary dict.
"""
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger('replay_failures')
logger.addHandler(logging.NullHandler())
logger.propagate = False

BENCH_CAPS = dict(KV=20, NP=256, NS=512, NPT=320, NE=2304)
ROOMY_CAPS = dict(KV=24, NP=320, NS=768, NPT=448, NE=3000)


def collect_trajectories(spec, model, params, init_state, B, T, key):
    """rollout_bench with per-step recording: returns host numpy arrays
    (actions (T,B,2), was_reset (T,B), done (T,B), failure (T,B))."""
    import jax
    import jax.numpy as jnp
    from urban_tpu.jaxenv.rollout import (broadcast_state, make_batch_fns,
                                          apply_stage_rewards)

    batch_obs, batch_step = make_batch_fns(spec)
    init_b = broadcast_state(init_state, B)
    start = broadcast_state(init_state.replace(done=jnp.asarray(True)), B)

    def scan_body(state, step_rng):
        was_reset = state.done
        state = jax.tree.map(
            lambda i, s: jnp.where(
                state.done.reshape((-1,) + (1,) * (s.ndim - 1)), i, s),
            init_b, state)
        obs = batch_obs(state)
        action, _, _ = model.apply(params, obs, step_rng,
                                   jnp.zeros(B, bool),
                                   method='sample_action_logp_value')
        next_state, reward, done, info = batch_step(state, action)
        next_state, reward = apply_stage_rewards(spec, next_state, reward,
                                                 info)
        return next_state, (action, was_reset, done, info['failure'])

    rngs = jax.random.split(key, T)
    _, (acts, resets, dones, fails) = jax.lax.scan(scan_body, start, rngs)
    return (np.asarray(acts), np.asarray(resets), np.asarray(dones),
            np.asarray(fails))


def _decode_jit_action(spec, state, action):
    """(stage, payload): land_use -> (block centroid, intersection xy);
    road -> segment midpoint. Decoded from the CURRENT jit state."""
    import jax
    from urban_tpu.jaxenv import geometry as jg

    stage = int(state.stage)
    if stage == 0:
        e = np.asarray(state.edge[action[0]])
        p = int(e[0] if e[0] < spec.NP else e[1])
        q = int((e[1] if e[0] < spec.NP else e[0]) - spec.NP - spec.NS)
        cent = np.asarray(jg.ring_centroid(state.poly_ring[p],
                                           state.poly_nvert[p]))
        ptxy = np.asarray(state.pt[q])
        return 'land_use', (cent, ptxy)
    s = int(action[1]) - spec.NP
    seg = np.asarray(state.seg[s])
    return 'road', 0.5 * (seg[0] + seg[1])


def _host_land_use_action(plc, mask, cent, ptxy, tol=2.0):
    """Invert test_lockstep_episode._jax_matching_edge: find the host graph
    edge whose feasible-block centroid and intersection match."""
    from urban_tpu import city_config
    rows, edges = plc._get_current_gdf_and_graph()
    best, best_d = None, tol
    for a in np.nonzero(mask)[0]:
        i, j = edges[a]
        ri, rj = rows[i], rows[j]
        if plc._table.types[ri] != city_config.FEASIBLE:
            ri, rj = rj, ri
        d = (np.linalg.norm(plc._table.geoms[ri].centroid - cent)
             + np.linalg.norm(plc._table.geoms[rj].coords[0] - ptxy))
        if d < best_d:
            best, best_d = int(a), d
    return best


def _host_road_action(plc, mask, mid, tol=2.0):
    rows, _ = plc._get_current_gdf_and_graph()
    best, best_d = None, tol
    for a in np.nonzero(mask)[0]:
        g = plc._table.geoms[rows[a]]
        m = 0.5 * (np.asarray(g.coords[0]) + np.asarray(g.coords[-1]))
        d = np.linalg.norm(m - mid)
        if d < best_d:
            best, best_d = int(a), d
    return best


def replay_one(cfg, spec, init_state, actions, fail_step):
    """Replay one failing episode's jit actions through BOTH engines.

    Returns a dict with the per-engine outcome at the failure step."""
    import jax
    import jax.numpy as jnp
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.jaxenv import step as js

    env = CityEnv(cfg)
    env.reset()
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))
    state = init_state

    res = dict(steps=len(actions), fail_step=fail_step, jit_fail_at=None,
               host_result='in_lockstep', host_fail_at=None, mapped=0)
    for k, act in enumerate(actions):
        stage, payload = _decode_jit_action(spec, state, act)
        # host action mapping from the live host state
        if stage == 'land_use':
            ha = _host_land_use_action(env._plc, env._current_land_use_mask,
                                       *payload)
            host_action = np.array([ha if ha is not None else 0, 0], float)
        else:
            if env._stage == 'land_use':
                res['host_result'] = 'stage_diverged'
                break
            ha = _host_road_action(env._plc, env._current_road_mask, payload)
            host_action = np.array([0, ha if ha is not None else 0], float)
        state, r_jax, done_jax, info_jax = step_fn(
            state, jnp.asarray(act, jnp.int32))
        jit_failed = bool(info_jax['failure'])
        if jit_failed and res['jit_fail_at'] is None:
            res['jit_fail_at'] = k

        if ha is None:
            # the jit action has no geometric counterpart in the host mask:
            # either the plans drifted apart or the host mask rejects it
            res['host_result'] = ('host_mask_rejects_final' if jit_failed
                                  else 'unmappable')
            break
        res['mapped'] += 1
        try:
            _, r_host, done_host, _ = env.step(host_action, logger)
        except Exception as err:  # InfeasibleActionError or engine assert
            res['host_result'] = f'host_raised:{type(err).__name__}'
            res['host_fail_at'] = k
            break
        host_failed = bool(done_host) and \
            float(r_host) == float(env.FAILURE_REWARD)
        if host_failed:
            res['host_result'] = 'host_failed'
            res['host_fail_at'] = k
            break
        if jit_failed:
            res['host_result'] = 'host_survived'
            break
    return res


def _episode_start(resets, b, t):
    for tt in range(t, -1, -1):
        if resets[tt, b]:
            return tt
    return 0


HOST_FAIL_RESULTS = ('host_failed',)  # host engine fails the same episode
# 'host_raised' = the host engine's own invariant asserts fired — the
# reference converts exactly these into FAILURE_REWARD terminations
# (reference city.py:450-457), so it also counts as host-confirmed
HOST_CONFIRMED_RESULTS = ('host_failed', 'host_raised')


def run_corpus(scenario='hlg', caps=None, B=256, T=30, key_seed=2,
               params_seed=0, budget_s=None, max_failures=None,
               n_success=20, verbose=True):
    """Replay the bench failure corpus (and a sample of SUCCESS episodes)
    through the host oracle; returns a fidelity-metrics dict.

    The (B, T, key_seed, params_seed, caps) defaults reproduce bench.py's
    first timed trial exactly, so the corpus replayed IS the corpus the
    headline bench reports. budget_s bounds host wall-clock; coverage is
    reported honestly in the output."""
    import time
    import jax
    from urban_tpu.utils.config import Config
    from urban_tpu.envs.plan_client import PlanClient
    from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
    from urban_tpu.jaxenv.step import build_obs
    from urban_tpu.models.model import create_model

    caps = caps or BENCH_CAPS
    cfg = Config(scenario, 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length,
                          caps=caps)
    init_state = build_initial_state(spec, plc)
    mcfg = Config(scenario, 0, tmp=True)
    mcfg.state_encoder_specs = dict(mcfg.state_encoder_specs)
    mcfg.state_encoder_specs['max_num_nodes'] = spec.num_features
    mcfg.state_encoder_specs['max_num_edges'] = spec.NE
    model = create_model(mcfg, 'sgnn')
    obs0 = jax.tree.map(lambda x: x[None], build_obs(spec, init_state))
    params = model.init(jax.random.PRNGKey(params_seed), obs0)

    acts, resets, dones, fails = collect_trajectories(
        spec, model, params, init_state, B, T, jax.random.PRNGKey(key_seed))
    fail_events = list(zip(*np.nonzero(fails.T)))         # (b, t)
    succ_events = list(zip(*np.nonzero((dones & ~fails).T)))
    if verbose:
        print(f'corpus: {int(dones.sum())} episodes, '
              f'{len(fail_events)} failures at caps={caps}')

    t_start = time.time()

    def out_of_budget():
        return budget_s is not None and time.time() - t_start > budget_s

    def replay_events(events, limit):
        outcomes = []
        for b, t in events[:limit] if limit else events:
            if out_of_budget():
                break
            t0 = _episode_start(resets, b, t)
            res = replay_one(Config(scenario, 0, tmp=True), spec,
                             init_state, acts[t0:t + 1, b],
                             fail_step=t - t0)
            res.update(env=int(b), t=int(t), t0=int(t0))
            res = {k: (int(v) if isinstance(v, np.integer) else v)
                   for k, v in res.items()}
            outcomes.append(res)
            if verbose:
                print(json.dumps(res))
        return outcomes

    fail_out = replay_events(fail_events, max_failures)
    # spread the success sample across envs (first-done episodes are
    # correlated in t, not in env index)
    rng = np.random.default_rng(key_seed)
    succ_sample = [succ_events[i] for i in
                   rng.permutation(len(succ_events))[:n_success]]
    succ_out = replay_events(succ_sample, None)

    def tally(outcomes):
        s = {}
        for r in outcomes:
            s[r['host_result']] = s.get(r['host_result'], 0) + 1
        return s

    n_fail_total = len(fail_events)
    n_fail_rep = len(fail_out)
    confirmed = sum(1 for r in fail_out
                    if r['host_result'] in HOST_CONFIRMED_RESULTS)
    # mapped = the replay stayed geometrically identified end to end; an
    # unmappable episode is indeterminate, not a host-survival
    adjudicated = sum(1 for r in fail_out if r['host_result'] in
                      HOST_CONFIRMED_RESULTS + ('host_survived',))
    succ_host_fail = sum(1 for r in succ_out
                         if r['host_result'] in HOST_CONFIRMED_RESULTS)
    succ_adjudicated = sum(1 for r in succ_out if r['host_result'] in
                           HOST_CONFIRMED_RESULTS + ('in_lockstep',))
    episodes = int(dones.sum())
    jit_fail_rate = n_fail_total / max(episodes, 1)
    # host failure rate under the SAME action sequences, estimated from
    # both conditional branches of the corpus
    p_fail_given_fail = confirmed / max(adjudicated, 1)
    p_fail_given_succ = succ_host_fail / max(succ_adjudicated, 1)
    host_rate = (jit_fail_rate * p_fail_given_fail
                 + (1 - jit_fail_rate) * p_fail_given_succ)
    metrics = {
        'scenario': scenario,
        'episodes': episodes,
        'jit_failures': n_fail_total,
        'jit_failure_rate': round(jit_fail_rate, 4),
        'failures_replayed': n_fail_rep,
        'failure_replay_coverage': round(n_fail_rep / max(n_fail_total, 1),
                                         3),
        'failures_host_confirmed': confirmed,
        'failures_adjudicated': adjudicated,
        'failure_host_confirmed_pct': round(
            100.0 * confirmed / max(adjudicated, 1), 1),
        'failure_outcomes': tally(fail_out),
        'successes_replayed': len(succ_out),
        'success_host_fail': succ_host_fail,
        'success_outcomes': tally(succ_out),
        'host_failure_rate_est': round(host_rate, 4),
        'host_vs_jit_failure_ratio': round(
            host_rate / max(jit_fail_rate, 1e-9), 3),
        'replay_wall_s': round(time.time() - t_start, 1),
    }
    return metrics, fail_out, succ_out


def run(max_episodes=40, caps=None, B=256, T=30, scenario='hlg'):
    metrics, fail_out, _ = run_corpus(scenario, caps=caps, B=B, T=T,
                                      max_failures=max_episodes,
                                      n_success=0)
    return metrics['failure_outcomes'], fail_out


if __name__ == '__main__':
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    max_eps = int(sys.argv[1]) if len(sys.argv) > 1 else None
    caps = ROOMY_CAPS if '--roomy' in sys.argv else BENCH_CAPS
    metrics, _, _ = run_corpus(max_failures=max_eps, caps=caps)
    print(json.dumps(metrics, indent=2))
