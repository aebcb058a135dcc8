"""Road-stage and concept tests for the batched TPU environment."""
import logging

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from urban_tpu import city_config
from urban_tpu.envs.city import CityEnv
from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.jaxenv import step as js
from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
from urban_tpu.utils.config import Config
from urban_tpu.utils.io import load_yaml

logger = logging.getLogger('test_jaxenv_road')
logger.addHandler(logging.NullHandler())
logger.propagate = False


@pytest.mark.slow
def test_road_stage_on_frozen_land_use():
    # complete land use with the exact host engine on grid, then drive the
    # ROAD stage in the jitted env from the frozen plan (the reference's
    # two-phase finetune setup, train.py:70-72)
    cfg_dict = load_yaml('urban_tpu/cfg/**/grid.yaml')
    cfg = Config('grid', 0, tmp=True, cfg_dict=cfg_dict)
    env = CityEnv(cfg)
    obs = env.reset()
    rng = np.random.default_rng(1)
    for _ in range(400):
        stage = int(obs[-1].argmax())
        if stage != 0:
            break
        mask = obs[6]
        a = int(rng.choice(np.nonzero(mask)[0]))
        obs, r, done, info = env.step(np.array([a, 0], dtype=float), logger)
        assert not done or r > 0
    assert int(obs[-1].argmax()) == 1  # road stage reached

    frozen = env.snapshot_land_use()
    cfg2 = Config('grid', 0, tmp=True, cfg_dict=cfg_dict)
    cfg2.skip_land_use = True
    cfg2.skip_road = False
    plc = PlanClient(cfg2.objectives_plan, cfg2.init_plan)
    plc.freeze_land_use(frozen)
    plc.unplan_all_land_use()
    spec = build_env_spec(cfg2, plc, max_steps=cfg2.max_sequence_length)
    state = build_initial_state(spec, plc)
    assert int(state.stage) == 1
    assert int(state.total_road_steps) > 0

    obs_fn = jax.jit(lambda s: js.build_obs(spec, s))
    step_fn = jax.jit(lambda s, a: js.env_step(spec, s, a))
    done = False
    for i in range(int(state.total_road_steps) + 5):
        o = obs_fn(state)
        assert int(np.asarray(o[8]).argmax()) == 1
        rd = np.asarray(o[7])
        valid = np.nonzero(rd)[0]
        assert len(valid) > 0
        a = int(rng.choice(valid))
        state, reward, done, info = step_fn(
            state, jnp.asarray([0, a], dtype=jnp.int32))
        if bool(done):
            break
    assert bool(done)
    assert not bool(info['failure'])
    # terminal road reward is the weighted road-network score, in (0, 1]
    assert 0.0 < float(reward) <= 1.0
    # roads were actually built
    n_roads = int(jnp.sum(state.seg_alive
                          & (state.seg_type == city_config.ROAD)))
    assert n_roads > int(np.asarray(js.road_mask(spec, state)).sum())


def test_concept_reward_jax_matches_host():
    cfg = Config('hlg_concept', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc)
    # place everything as green via host env to get a comparable plan? Too
    # slow — instead compare on the INITIAL plan (has residential + green_l)
    jax_val = float(js.concept_reward(spec, state))
    host_val, _ = plc.get_concept_reward()
    assert jax_val == pytest.approx(host_val, abs=0.05)
