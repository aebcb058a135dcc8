"""Reward parity: jit reward kernels vs the exact host engine on the SAME
plan state (HLG's initial plan already contains residential and green_l
features, so all reward channels are exercised)."""
import numpy as np
import pytest

from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.jaxenv import step as js
from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
from urban_tpu.utils.config import Config


@pytest.fixture(scope='module')
def setup():
    cfg = Config('hlg', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc)
    return plc, spec, state


def test_life_circle_parity(setup):
    plc, spec, state = setup
    host, _ = plc.get_life_circle_reward()
    jit = float(js.life_circle_reward(spec, state))
    # same formula (exact centroids / distances); float32 vs float64 only
    assert jit == pytest.approx(host, abs=2e-3)


def test_greenness_parity(setup):
    plc, spec, state = setup
    host = plc.get_greenness_reward()          # raster coverage
    jit = float(js.greenness_reward(spec, state))  # sample-point coverage
    # different estimators of the same quantity; agree within tolerance
    assert jit == pytest.approx(host, abs=0.08)


def test_pending_and_done_parity(setup):
    plc, spec, state = setup
    land_use, _ = plc.get_current_land_use_and_mask()
    assert int(js.pending_land_use_type(spec, state)) == land_use['type']
    assert bool(js.is_land_use_done(spec, state)) == plc.is_land_use_done()


def test_mask_count_parity(setup):
    plc, spec, state = setup
    land_use, host_mask = plc.get_current_land_use_and_mask()
    t = js.pending_land_use_type(spec, state)
    jit_mask = js.land_use_mask(spec, state, t)
    assert int(np.asarray(jit_mask).sum()) == int(host_mask.sum())


@pytest.mark.slow
def test_road_network_reward_parity_grid():
    """Drive a full two-stage episode (land use + roads) in the jitted env
    on the grid scenario, export the terminal plan, and compare the jit
    road-network reward — incl. false-node merging and the raster
    large-block penalty — against the exact host engine on the SAME plan
    (reference formulas at plan_client.py:833-887)."""
    import jax
    import jax.numpy as jnp
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.jaxenv.state import state_to_table

    cfg = Config('grid', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc)
    assert not spec.skip_road and spec.road_ratio > 0

    obs_fn = jax.jit(lambda s: js.build_obs(spec, s))
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))
    rng = np.random.default_rng(7)
    done = False
    for _ in range(cfg.max_sequence_length + 40):
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
    n_roads = int(np.asarray(state.seg_alive
                             & (state.seg_type == 2)).sum())
    assert n_roads > 0

    table = state_to_table(state)
    env = CityEnv(cfg)
    env.load_plan(table)
    host_reward, host_info = env._plc.get_road_network_reward()
    jit_reward = float(js.road_network_reward(spec, state))
    assert jit_reward == pytest.approx(host_reward, abs=1e-2)

    # component-level agreement (each is 1/(count+1) or a ratio)
    end = np.asarray(state.seg).reshape(-1, 2)
    jit_large = int(js._large_block_count(
        spec, state, state.seg_alive & (state.seg_type == 2)))
    host_large = round(1.0 / host_info['road_distance_penalty'] - 1)
    assert jit_large == host_large
