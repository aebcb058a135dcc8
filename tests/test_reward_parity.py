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
