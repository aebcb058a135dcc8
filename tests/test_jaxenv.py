"""Tests for the batched TPU environment (CPU backend, small sizes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from urban_tpu import city_config
from urban_tpu.utils.config import Config
from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
from urban_tpu.jaxenv import step as js
from urban_tpu.jaxenv.rollout import (batched_gae, episode_success_weights,
                                      packed_action_to_slots)


@pytest.fixture(scope='module')
def hlg_setup():
    cfg = Config('hlg', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc)
    return cfg, plc, spec, state


def test_free_slots():
    alive = jnp.asarray([True, False, True, False, False])
    slots, ovf = js.free_slots(alive, 2)
    assert slots.tolist() == [1, 3]
    assert not bool(ovf)
    slots, ovf = js.free_slots(alive, 4)
    assert bool(ovf)


def test_initial_obs_matches_host(hlg_setup):
    cfg, plc, spec, state = hlg_setup
    obs = js.build_obs_packed(spec, state)
    # host env initial observation
    from urban_tpu.envs.city import CityEnv
    env = CityEnv(cfg)
    host_obs = env.reset()
    assert int(obs[4].sum()) == int(host_obs[4].sum())       # node count
    assert int(obs[5].sum()) == int(host_obs[5].sum())       # edge count
    assert int(obs[6].sum()) == int(host_obs[6].sum())       # action count
    assert np.asarray(obs[0]) == pytest.approx(host_obs[0], abs=1e-5)
    # node type histogram matches (ordering may differ)
    t_jax = np.asarray(obs[1][:, :14]).argmax(axis=1)[np.asarray(obs[4])]
    t_host = host_obs[1][:, :14].argmax(axis=1)[host_obs[4]]
    assert np.bincount(t_jax, minlength=14).tolist() == \
        np.bincount(t_host, minlength=14).tolist()


def test_pending_type_progression(hlg_setup):
    cfg, plc, spec, state = hlg_setup
    t = int(js.pending_land_use_type(spec, state))
    assert t == city_config.HOSPITAL_L  # first in plan order for HLG
    # fake-fill hospital_l requirements -> next is school
    state2 = state.replace(
        plan_count=state.plan_count.at[city_config.HOSPITAL_L].set(2))
    assert int(js.pending_land_use_type(spec, state2)) == city_config.SCHOOL


@pytest.mark.slow
def test_full_episode_jax_env(hlg_setup):
    # Random play CAN legitimately end in a geometry FAILURE (the host
    # engine fails on the same action sequences — e.g. rng seed 0 fails at
    # step 12 on both tiers); require a clean completion within a few seeds.
    cfg, plc, spec, state0 = hlg_setup
    obs_fn = jax.jit(lambda s: js.build_obs(spec, s))
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))
    done = False
    for seed in range(4):
        state = state0
        rng = np.random.default_rng(seed)
        for i in range(60):
            obs = obs_fn(state)
            stage = int(np.asarray(obs[8]).argmax())
            mask = np.asarray(obs[6] if stage == 0 else obs[7])
            valid = np.nonzero(mask)[0]
            assert len(valid) > 0
            a = int(rng.choice(valid))
            action = jnp.asarray([a if stage == 0 else 0,
                                  a if stage == 1 else 0], dtype=jnp.int32)
            state, reward, done, info = step_fn(state, action)
            if bool(done):
                break
        if bool(done) and not bool(info['failure']):
            break
    assert bool(done)
    assert not bool(info['failure'])
    # HLG skip_road: terminal reward = land-use reward, in the same range the
    # exact host engine produces for random play (2.5-3.5)
    assert 2.0 < float(reward) < 4.5
    # all counts met
    counts = np.asarray(state.plan_count)
    req = np.asarray(spec.required_plan_count)
    order = list(spec.plan_order)
    assert all(counts[t] >= req[t] for t in order)


def test_failure_code_names_decode():
    # the taxonomy decode is pure python: composite masks decode to the
    # union of their cause names, 0 decodes to nothing
    assert js.failure_code_names(0) == []
    assert js.failure_code_names(js.FAIL_SLICE) == ['slice']
    names = js.failure_code_names(js.FAIL_SLICE | js.FAIL_NO_MOVES)
    assert set(names) == {'slice', 'no_moves'}
    # every bit has a unique name
    assert len(set(js.FAILURE_BIT_NAMES.values())) == \
        len(js.FAILURE_BIT_NAMES)


def test_failure_code_matches_failure_flag(hlg_setup):
    # rng seed 0 random play fails (host-confirmed, see
    # test_full_episode_jax_env); the info dict must carry a nonzero
    # failure_code whose bool reduction equals info['failure'], with
    # every set bit a known cause.
    cfg, plc, spec, state0 = hlg_setup
    obs_fn = jax.jit(lambda s: js.build_obs(spec, s))
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))
    state = state0
    rng = np.random.default_rng(0)
    saw_failure = False
    for i in range(60):
        obs = obs_fn(state)
        stage = int(np.asarray(obs[8]).argmax())
        mask = np.asarray(obs[6] if stage == 0 else obs[7])
        valid = np.nonzero(mask)[0]
        a = int(rng.choice(valid))
        action = jnp.asarray([a if stage == 0 else 0,
                              a if stage == 1 else 0], dtype=jnp.int32)
        state, reward, done, info = step_fn(state, action)
        code = int(info['failure_code'])
        assert (code != 0) == bool(info['failure'])
        if code:
            saw_failure = True
            names = js.failure_code_names(code)
            assert names, f'unknown failure bits in {code:#x}'
            known = 0
            for bit in js.FAILURE_BIT_NAMES:
                known |= bit
            assert code & ~known == 0
        if bool(done):
            break
    assert saw_failure and bool(done)
    assert float(reward) == js.FAILURE_REWARD


def test_episode_success_weights():
    dones = jnp.asarray([[0, 0], [1, 0], [0, 0], [1, 1]], dtype=bool)
    fails = jnp.asarray([[0, 0], [0, 0], [0, 0], [1, 0]], dtype=bool)
    rewards = jnp.asarray([[0.0, 0.0], [2.5, 0.0], [0.0, 0.0], [-1.0, 3.0]])
    w = np.asarray(episode_success_weights(dones, fails, rewards))
    # env 0: first episode (steps 0-1) success; second (2-3) failure
    assert w[:, 0].tolist() == [1.0, 1.0, 0.0, 0.0]
    # env 1: single episode ending at step 3 with positive reward
    assert w[:, 1].tolist() == [1.0, 1.0, 1.0, 1.0]


def test_batched_gae_matches_reference_formula():
    from urban_tpu.rl.gae import estimate_advantages_np
    T, B = 6, 2
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    dones = np.zeros((T, B), bool)
    dones[2, 0] = True
    dones[5, :] = True
    values = rng.normal(size=(T, B)).astype(np.float32)
    adv, ret = batched_gae(jnp.asarray(rewards), jnp.asarray(dones),
                           jnp.asarray(values), 0.99, 0.95)
    for b in range(B):
        a_np, r_np = estimate_advantages_np(
            rewards[:, b], 1.0 - dones[:, b].astype(np.float32),
            values[:, b], 0.99, 0.95)
        assert np.asarray(adv)[:, b] == pytest.approx(a_np, abs=1e-4)
        assert np.asarray(ret)[:, b] == pytest.approx(r_np, abs=1e-4)


@pytest.mark.parametrize('scenario,rmin,rmax', [('dhm', 2.0, 4.5),
                                                ('hlg_concept', 2.0, 5.0)])
@pytest.mark.slow
def test_full_episode_other_scenarios(scenario, rmin, rmax):
    """DHM and the concept-conditioned HLG also run to completion in the
    jitted env with plausible terminal rewards (concept_weight exercises the
    center/axis reward in land_use_stage_reward)."""
    cfg = Config(scenario, 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc)
    if scenario == 'hlg_concept':
        assert len(spec.concepts) == 3 and spec.concept_weight == 3.0
    obs_fn = jax.jit(lambda s: js.build_obs(spec, s))
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))
    rng = np.random.default_rng(2)
    done = False
    for _ in range(70):
        obs = obs_fn(state)
        stage = int(np.asarray(obs[8]).argmax())
        mask = np.asarray(obs[6] if stage == 0 else obs[7])
        valid = np.nonzero(mask)[0]
        assert len(valid) > 0
        a = int(rng.choice(valid))
        state, reward, done, info = step_fn(
            state, jnp.asarray([a if stage == 0 else 0,
                                a if stage == 1 else 0], dtype=jnp.int32))
        if bool(done):
            break
    assert bool(done) and not bool(info['failure'])
    assert rmin < float(reward) < rmax


@pytest.mark.slow
def test_edge_liveness_invariant(hlg_setup):
    """build_obs relies on edge_alive implying both endpoints alive (the
    per-step endpoint re-check was dropped as two serialized gathers);
    verify the invariant holds along a full episode."""
    cfg, plc, spec, state0 = hlg_setup
    state = state0
    obs_fn = jax.jit(lambda s: js.build_obs(spec, s))
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))
    rng = np.random.default_rng(5)
    for _ in range(40):
        alive = np.asarray(js.feature_alive(spec, state))
        edges = np.asarray(state.edge)
        e_alive = np.asarray(state.edge_alive)
        assert alive[edges[e_alive, 0]].all()
        assert alive[edges[e_alive, 1]].all()
        obs = obs_fn(state)
        stage = int(np.asarray(obs[8]).argmax())
        mask = np.asarray(obs[6] if stage == 0 else obs[7])
        valid = np.nonzero(mask)[0]
        if len(valid) == 0:
            break
        a = int(rng.choice(valid))
        state, reward, done, info = step_fn(
            state, jnp.asarray([a if stage == 0 else 0,
                                a if stage == 1 else 0], dtype=jnp.int32))
        if bool(done):
            break


def test_normalize_advantages_weighted_stats():
    """normalize_advantages standardizes over weighted rows only; excluded
    (failed/truncated) rows cannot skew the statistics."""
    import numpy as np
    import jax.numpy as jnp
    from urban_tpu.jaxenv.rollout import normalize_advantages

    rng = np.random.default_rng(0)
    adv = jnp.asarray(rng.normal(2.0, 0.03, size=(50, 8)))
    w = jnp.asarray((rng.random((50, 8)) < 0.7).astype(np.float32))
    # poison the excluded rows with huge values: must not affect the result
    adv = adv + (1.0 - w) * 1e6
    out = np.asarray(normalize_advantages(adv, w))
    wn = np.asarray(w)
    mu = (out * wn).sum() / wn.sum()
    var = (((out - mu) ** 2) * wn).sum() / wn.sum()
    assert abs(mu) < 1e-4
    assert abs(var - 1.0) < 1e-3
