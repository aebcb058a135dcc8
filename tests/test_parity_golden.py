"""Golden parity tests: score the reference's published final plans.

The reference ships its paper-result plans as GeoJSON (reference:
results/hlg.geojson, results/dhm.geojson) and re-scores them with
env.load_plan + env.score_plan (reference demo/demo.ipynb, city.py:621-635).
These tests pin our engine's scores on those exact artifacts — any reward or
geometry regression shows up here. Golden values recorded from the exact
host engine (see BASELINE.md)."""
import os

import numpy as np
import pytest

from urban_tpu.envs.city import CityEnv
from urban_tpu.io.geojson import load_geojson, save_geojson, table_from_geojson, \
    table_to_geojson
from urban_tpu.utils.config import Config
from urban_tpu.utils.io import load_yaml

REF_RESULTS = '/root/reference/results'

GOLDEN = {
    # total = 4*life_circle + greenness + road_network (all weights active)
    'hlg': dict(life_circle=0.7266, greenness=0.7305, road_network=0.6815,
                life_circle_15min=1.0, life_circle_10min=0.71,
                connectivity_reward=1.0, dead_end_penalty=1.0),
    'dhm': dict(life_circle=0.7637, greenness=0.8981, road_network=0.5262,
                life_circle_15min=0.9613, life_circle_10min=0.7484,
                connectivity_reward=1.0, dead_end_penalty=1.0),
}


@pytest.mark.parametrize('name', ['hlg', 'dhm'])
def test_score_published_plan(name):
    path = f'{REF_RESULTS}/{name}.geojson'
    if not os.path.exists(path):
        pytest.skip('reference results not available')
    cfg_dict = load_yaml(f'urban_tpu/cfg/**/{name}.yaml')
    cfg_dict['reward_specs']['road_network_weight'] = 1.0
    cfg = Config(name, 0, tmp=True, cfg_dict=cfg_dict)
    env = CityEnv(cfg)
    env.load_plan(load_geojson(path))
    reward, info = env.score_plan(verbose=False)
    g = GOLDEN[name]
    assert info['life_circle'] == pytest.approx(g['life_circle'], abs=2e-3)
    # greenness is computed on a raster; allow a small tolerance
    assert info['greenness'] == pytest.approx(g['greenness'], abs=2e-2)
    assert info['road_network'] == pytest.approx(g['road_network'], abs=2e-3)
    lci = info['life_circle_info']
    assert lci['life_circle_15min'] == pytest.approx(
        g['life_circle_15min'], abs=2e-3)
    assert lci['life_circle_10min'] == pytest.approx(
        g['life_circle_10min'], abs=2e-3)
    rni = info['road_network_info']
    assert rni['connectivity_reward'] == pytest.approx(
        g['connectivity_reward'])
    assert rni['dead_end_penalty'] == pytest.approx(g['dead_end_penalty'])


def test_geojson_roundtrip(tmp_path):
    path = f'{REF_RESULTS}/hlg.geojson'
    if not os.path.exists(path):
        pytest.skip('reference results not available')
    table = load_geojson(path)
    out = tmp_path / 'roundtrip.geojson'
    save_geojson(table, str(out))
    table2 = load_geojson(str(out))
    assert len(table2) == len(table)
    assert np.array_equal(table2.types, table.types)
    assert np.array_equal(table2.existence, table.existence)
    for g1, g2 in zip(table.geoms[:20], table2.geoms[:20]):
        assert g1.kind == g2.kind
        assert np.allclose(g1.coords, g2.coords)


BASELINE_GOLDEN = {
    ('hlg', 'rule-centralized'): 2.6321,
    ('hlg', 'rule-decentralized'): 3.3039,
    ('hlg', 'gsca'): 3.6798,
    ('dhm', 'rule-centralized'): 2.4190,
}


@pytest.mark.parametrize('scenario,agent', list(BASELINE_GOLDEN))
def test_heuristic_baseline_regression(scenario, agent):
    """Deterministic heuristic-agent episodes (seed 111, greedy) pinned as
    regression values (the reference's re-derivable baseline runs,
    README.md:64-85)."""
    import logging
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.models.baseline import (GSCAPolicy, RuleCentralizedPolicy,
                                           RuleDecentralizedPolicy)
    from urban_tpu.rl.sampler import eval_episode
    logging.disable(logging.CRITICAL)
    cfg = Config(scenario, 111, tmp=True)
    env = CityEnv(cfg)
    plc = env._plc
    pol = {'rule-centralized': RuleCentralizedPolicy,
           'rule-decentralized': RuleDecentralizedPolicy}.get(agent)
    policy = pol() if pol else GSCAPolicy(plc._grid_cols, plc._grid_rows,
                                          plc._cell_edge_length)

    def select(obs, seed, mean_action):
        single = [np.asarray(o[0]) for o in obs]
        rng = np.random.default_rng(seed)
        return np.asarray(policy.select_action(single, rng, mean_action))[None]

    log, info, success = eval_episode(env, select, mean_action=True, seed=111)
    assert success
    assert log.avg_episode_reward == pytest.approx(
        BASELINE_GOLDEN[(scenario, agent)], abs=1e-3)
