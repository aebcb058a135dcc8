"""Host-oracle vs jitted-env divergence harness.

Replays N seeded episodes in lockstep: each step the host engine picks a
random valid (block, intersection) action, the jitted env takes the edge
joining the geometrically matching features, and both engines step. Reports

  * mask-count agreement rate (host vs jit action-candidate counts)
  * action representability (the host's chosen action exists in the jit
    mask, i.e. the jit plan still contains the same block/intersection)
  * matched steps before the running stats diverge
  * terminal-reward deltas for episodes both engines complete in lockstep

Usage: JAX_PLATFORMS=cpu python tools/divergence.py [n_seeds] [scenario|all]
(the env var must be set at process start: the axon TPU plugin opens its
tunnel connection during backend discovery even when jax.config later pins
the cpu platform, and that connection blocks behind any training process
holding the chip)
Writes DIVERGENCE.md at the repo root when run as a script; the CI wrapper
(tests/test_lockstep_episode.py::test_divergence_metrics) asserts thresholds
on a smaller seed set.
"""
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger('divergence')
logger.addHandler(logging.NullHandler())
logger.propagate = False


def _host_road_midpoint(plc, action):
    rows, _ = plc._get_current_gdf_and_graph()
    g = plc._table.geoms[rows[action]]
    return 0.5 * (np.asarray(g.coords[0]) + np.asarray(g.coords[-1]))


def _jax_matching_road(spec, state, jit_mask, mid, tol=2.0):
    """Jit road action (node slot) whose segment midpoint matches the host's
    chosen boundary segment."""
    segs = np.asarray(state.seg)
    mids = 0.5 * (segs[:, 0] + segs[:, 1])
    best, best_d = None, tol
    for i in np.nonzero(jit_mask)[0]:
        s = int(i) - spec.NP
        d = float(np.linalg.norm(mids[s] - mid))
        if d < best_d:
            best, best_d = int(i), d
    return best


def replay_episode(cfg, seed: int, max_steps: int = 60):
    """One lockstep episode (land-use AND road stages); returns a metrics
    dict."""
    import jax
    import jax.numpy as jnp
    from urban_tpu import city_config
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.envs.plan_client import PlanClient
    from urban_tpu.jaxenv import step as js
    from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
    from tests.test_lockstep_episode import (_host_action_identity,
                                             _jax_matching_edge)

    env = CityEnv(cfg)
    obs = env.reset()
    plc = env._plc
    plc2 = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc2, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc2)
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))

    rng = np.random.default_rng(seed)
    m = dict(seed=seed, steps=0, matched_steps=0, mask_agree=0,
             representable=0, road_steps=0, completed_both=False,
             completed_host=False, reward_host=None, reward_jax=None,
             reward_delta=None, diverged_at=None)
    STAGE_ID = {'land_use': 0, 'road': 1, 'done': 2}
    for step in range(max_steps):
        # both engines must agree on the CURRENT stage before acting
        if STAGE_ID[env._stage] != int(state.stage):
            m['diverged_at'] = step
            break
        if env._stage == 'road':
            valid = np.nonzero(obs[7])[0]
            if len(valid) == 0:
                break
            jit_mask = np.asarray(js.road_mask(spec, state))
            m['steps'] += 1
            m['road_steps'] += 1
            if int(jit_mask.sum()) == len(valid):
                m['mask_agree'] += 1
            action = int(rng.choice(valid))
            mid = _host_road_midpoint(plc, action)
            jax_action = _jax_matching_road(spec, state, jit_mask, mid)
            if jax_action is None:
                m['diverged_at'] = step
                break
            m['representable'] += 1
            obs, r_host, done_host, info_host = env.step(
                np.array([0, action], dtype=float), logger)
            state, r_jax, done_jax, info_jax = step_fn(
                state, jnp.asarray([0, jax_action], dtype=jnp.int32))
        else:
            valid = np.nonzero(obs[6])[0]
            if len(valid) == 0:
                break
            t = js.pending_land_use_type(spec, state)
            jit_mask = np.asarray(js.land_use_mask(spec, state, t))
            m['steps'] += 1
            if int(jit_mask.sum()) == len(valid):
                m['mask_agree'] += 1

            action = int(rng.choice(valid))
            centroid, inter_xy = _host_action_identity(plc, action)
            jax_action, err = _jax_matching_edge(spec, state, centroid,
                                                 inter_xy, t)
            if jax_action is None:
                m['diverged_at'] = step
                break
            m['representable'] += 1

            obs, r_host, done_host, info_host = env.step(
                np.array([action, 0], dtype=float), logger)
            state, r_jax, done_jax, info_jax = step_fn(
                state, jnp.asarray([jax_action, 0], dtype=jnp.int32))
        # the host env reports geometry failures only through the terminal
        # FAILURE_REWARD (city.py failure_step); both engines failing on
        # the same action is lockstep parity, not divergence
        fail_host = bool(done_host) and \
            float(r_host) == float(env.FAILURE_REWARD)
        if bool(info_jax['failure']) != fail_host:
            m['diverged_at'] = step
            break
        if fail_host:
            m['matched_steps'] += 1
            m['completed_host'] = True
            m['completed_both'] = True
            m['reward_host'] = float(r_host)
            m['reward_jax'] = float(r_jax)
            m['reward_delta'] = abs(float(r_host) - float(r_jax))
            break
        # land-use lockstep: identical plan-count stats every step; road
        # lockstep: identical count of upgraded road segments (road steps
        # mutate segment types, not plan counts)
        if m['road_steps'] > 0:
            n_road_h = int(np.count_nonzero(
                plc._table.existence
                & (plc._table.types == city_config.ROAD)))
            n_road_j = int(np.sum(np.asarray(state.seg_alive)
                                  & (np.asarray(state.seg_type)
                                     == city_config.ROAD)))
            if n_road_h != n_road_j:
                m['diverged_at'] = step
                break
        counts_h = plc.get_plan_ratio_and_count()[1]
        if not np.array_equal(counts_h, np.asarray(state.plan_count)):
            m['diverged_at'] = step
            break
        m['matched_steps'] += 1
        if done_host or bool(done_jax):
            m['completed_host'] = bool(done_host)
            if done_host and bool(done_jax):
                m['completed_both'] = True
                m['reward_host'] = float(r_host)
                m['reward_jax'] = float(r_jax)
                m['reward_delta'] = abs(float(r_host) - float(r_jax))
            break
    return m


def run(n_seeds: int = 50, scenario: str = 'hlg', start_seed: int = 100):
    from urban_tpu.utils.config import Config
    results = []
    for k in range(n_seeds):
        cfg = Config(scenario, 0, tmp=True)
        results.append(replay_episode(cfg, start_seed + k,
                                      max_steps=cfg.max_sequence_length
                                      + 20))
        r = results[-1]
        print(f'{scenario} seed {r["seed"]}: steps {r["steps"]} '
              f'(road {r["road_steps"]}) matched {r["matched_steps"]} '
              f'both_done {r["completed_both"]} dR {r["reward_delta"]}')
    return summarize(results, scenario)


def summarize(results, scenario):
    steps = sum(r['steps'] for r in results)
    agree = sum(r['mask_agree'] for r in results)
    rep = sum(r['representable'] for r in results)
    matched = [r['matched_steps'] for r in results]
    both = [r for r in results if r['completed_both']]
    deltas = [r['reward_delta'] for r in both]
    out = {
        'scenario': scenario,
        'episodes': len(results),
        'total_steps': steps,
        'road_steps': sum(r['road_steps'] for r in results),
        'mask_count_agreement_rate': agree / max(steps, 1),
        'action_representable_rate': rep / max(steps, 1),
        'matched_steps_mean': float(np.mean(matched)),
        'matched_steps_min': int(np.min(matched)),
        'full_lockstep_completion_rate': len(both) / max(len(results), 1),
        'terminal_reward_delta_mean': float(np.mean(deltas)) if deltas
        else None,
        'terminal_reward_delta_max': float(np.max(deltas)) if deltas
        else None,
        'divergent_seeds': [r['seed'] for r in results
                            if not r['completed_both']],
    }
    return out, results


ANALYSIS = """
## Analysis

The jit tier evaluates the host's FULL slicing decision tree
(jaxenv/slicer.py — U/L-shape refinement, rect-tri shrinking, part-edge
sweeps) with compensated-f32 crossing arithmetic (round 4) and the
host-canonical ring hygiene fixes (rounds 3-5). Lockstep means: identical
plan counts after every land-use step, identical upgraded-road counts
after every road step (round 5 extends the replay through the road stage
— grid episodes replay ~60 road steps each), both engines finishing
together, and a step where both engines reject the same action with the
terminal failure reward counting as parity, not divergence.

Round 5 closed the two dominant residual classes:

1. **Host zero-width flanges/bridges** (the bulk of the old grid tail,
   0.40 lockstep): half-plane wedge clipping kept subject vertices lying
   ON the clip line, so a difference against a boundary-touching parcel
   came back with a zero-width flange or a hole-plus-bridge ring that
   GEOS would never produce; the snap stage then saw phantom "new
   intersection" vertices and failed episodes the reference accepts.
   Fixed by cancel_zero_width in geometry/ops.py (self-insert vertices
   onto non-adjacent edges, split at repeated vertices). This was a HOST
   oracle bug — the jit engine was already correct, and fixing it also
   recovered previously-divergent hlg seeds (117, 129, 140).
2. **Jit arc-assembly pinch** (grid seed 103 class): per-row argmin
   tail→head matching in arc_pieces stopped being a permutation when a
   subject region touched the hull at a point; replaced with greedy
   unique matching in increasing arc distance.

The residual divergence class remains ill-conditioned borderline
decisions: when a cut side meets a block edge at a near-parallel angle,
the f32 intersection point can drift ~0.1 grid units from the float64
host's — far inside the engine's 1.0-unit snap tolerance, so the plans
stay functionally identical, but a later borderline decision (a DP keep,
a sliver threshold, a snap tie) can eventually flip. This is an
f32-vs-f64 conditioning limit, not a missing branch; the full
residual-deviation registry is the DEVIATIONS section of
urban_tpu/jaxenv/step.py. Terminal rewards of lockstep completions agree
to the documented sampled-greenness deviation (see docs/GREENNESS.md for
the raster-convergence bound on the host side).
"""
def _scenario_section(summary, results):
    lines = [
        '',
        f'## {summary["scenario"]}',
        '',
        f'- episodes: **{summary["episodes"]}**, '
        f'steps: **{summary["total_steps"]}** '
        f'(road-stage steps: {summary["road_steps"]})',
        f'- mask-count agreement rate: '
        f'**{summary["mask_count_agreement_rate"]:.3f}**',
        f'- host-action representable in jit mask: '
        f'**{summary["action_representable_rate"]:.3f}**',
        f'- matched steps/episode: mean '
        f'**{summary["matched_steps_mean"]:.1f}**, '
        f'min **{summary["matched_steps_min"]}**',
        f'- episodes completing in full lockstep: '
        f'**{summary["full_lockstep_completion_rate"]:.2f}**',
        f'- terminal reward |delta| (lockstep completions): mean '
        f'**{summary["terminal_reward_delta_mean"]}**, max '
        f'**{summary["terminal_reward_delta_max"]}**',
        f'- divergent seeds: {summary["divergent_seeds"] or "none"}',
        '',
        '| seed | steps | road | matched | both done | reward Δ |',
        '|---|---|---|---|---|---|',
    ]
    for r in results:
        d = f'{r["reward_delta"]:.4f}' if r['reward_delta'] is not None \
            else '—'
        lines.append(f'| {r["seed"]} | {r["steps"]} | {r["road_steps"]} '
                     f'| {r["matched_steps"]} | {r["completed_both"]} '
                     f'| {d} |')
    return lines


def write_report(sections, path):
    """sections: list of (summary, results) pairs, one per scenario."""
    lines = [
        '# DIVERGENCE — host oracle vs jitted TPU env (lockstep replay)',
        '',
        'Generated by `python tools/divergence.py [n_seeds] '
        '[scenario|all]`. Each seeded episode is replayed',
        'action-for-action in both engines (matching actions by',
        'block-centroid/intersection geometry for land-use, segment',
        'midpoint for roads); metrics quantify how long and how closely',
        'the jitted fixed-buffer env tracks the exact host engine.',
        '',
        '| scenario | episodes | lockstep | mask agree | representable '
        '| max reward Δ |',
        '|---|---|---|---|---|---|',
    ]
    for summary, _ in sections:
        dmax = summary['terminal_reward_delta_max']
        lines.append(
            f'| {summary["scenario"]} | {summary["episodes"]} '
            f'| {summary["full_lockstep_completion_rate"]:.2f} '
            f'| {summary["mask_count_agreement_rate"]:.3f} '
            f'| {summary["action_representable_rate"]:.3f} '
            f'| {dmax if dmax is None else round(dmax, 4)} |')
    for summary, results in sections:
        lines.extend(_scenario_section(summary, results))
    with open(path, 'w') as f:
        f.write('\n'.join(lines) + '\n' + ANALYSIS)


ALL_SCENARIOS = ('hlg', 'dhm', 'grid', 'huizhou', 'hlg_concept')


if __name__ == '__main__':
    # CPU differential harness: the host oracle is CPU-bound anyway, and
    # pinning the jit tier to CPU keeps the report reproducible when the
    # TPU tunnel is busy or down (JAX_PLATFORMS env is ignored by the
    # axon plugin — only the config route works)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    scenario = sys.argv[2] if len(sys.argv) > 2 else 'hlg'
    scenarios = ALL_SCENARIOS if scenario == 'all' else (scenario,)
    sections = []
    for sc in scenarios:
        summary, results = run(n, sc)
        print(json.dumps(summary, indent=2))
        sections.append((summary, results))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    write_report(sections, os.path.join(repo_root, 'DIVERGENCE.md'))
    with open(os.path.join(repo_root, 'DIVERGENCE.json'), 'w') as f:
        json.dump([s for s, _ in sections], f, indent=1)
