"""End-to-end environment tests on the bundled scenarios."""
import logging

import numpy as np
import pytest

from urban_tpu import city_config
from urban_tpu.utils.config import Config
from urban_tpu.envs.city import CityEnv, InfeasibleActionError

logger = logging.getLogger('test_env')
logger.addHandler(logging.NullHandler())
logger.propagate = False


def make_env(cfg_name: str) -> CityEnv:
    cfg = Config(cfg_name, global_seed=0, tmp=True)
    return CityEnv(cfg)


def run_random_episode(env, seed=0, max_steps=400):
    obs = env.reset()
    rng = np.random.default_rng(seed)
    total = 0.0
    for step in range(max_steps):
        stage = int(obs[-1].argmax())
        mask = obs[6] if stage == 0 else obs[7]
        valid = np.nonzero(mask)[0]
        assert len(valid) > 0
        a = int(rng.choice(valid))
        action = np.array([a if stage == 0 else 0, a if stage == 1 else 0],
                          dtype=float)
        obs, r, done, info = env.step(action, logger)
        total += r
        if done:
            return step + 1, r, total, info
    raise AssertionError('episode did not terminate')


@pytest.fixture(scope='module')
def grid_env():
    return make_env('grid')


def test_obs_layout(grid_env):
    obs = grid_env.reset()
    assert len(obs) == 9
    numerical, nodes, edges, cur, nmask, emask, lmask, rmask, stage = obs
    assert numerical.shape == (52,)   # 2 * (13 ratio + 13 count)
    assert nodes.shape == (1000, 23)  # 14 one-hot + 2 xy + 4 scalar + 3 domain
    assert edges.shape == (3000, 2)
    assert cur.shape == (23,)
    assert stage.shape == (3,) and stage.argmax() == 0
    # padded edge rows point at the sentinel node
    n_real = int(emask.sum())
    assert np.all(edges[n_real:] == 999)
    # one-hot/coordinate/domain features within [-1, 1]; the area/length/
    # width/height columns (16-19) may exceed 1 for large initial feasible
    # blocks (the reference normalizes by land-use maxima without clipping)
    in_range = np.concatenate([nodes[:, :16], nodes[:, 20:]], axis=1)
    assert in_range.min() >= -1.0 - 1e-6 and in_range.max() <= 1.0 + 1e-6
    assert np.isfinite(nodes).all()


def test_land_use_mask_edges_join_feasible_and_intersection(grid_env):
    obs = grid_env.reset()
    plc = grid_env._plc
    rows, edges = plc._get_current_gdf_and_graph()
    mask = obs[6][:len(edges)]
    types = plc._table.types[rows]
    kinds = np.array([plc._table.geoms[r].kind for r in rows])
    for e, m in zip(edges, mask):
        if m:
            t0, t1 = types[e[0]], types[e[1]]
            k0, k1 = kinds[e[0]], kinds[e[1]]
            assert {city_config.FEASIBLE} & {t0, t1}
            assert 0 in (k0, k1)  # POINT


def test_infeasible_action_raises(grid_env):
    obs = grid_env.reset()
    mask = obs[6]
    bad = int(np.nonzero(~mask)[0][0])
    with pytest.raises(InfeasibleActionError):
        grid_env.step(np.array([bad, 0], dtype=float), logger)


def test_full_episode_grid(grid_env):
    steps, final_r, total, info = run_random_episode(grid_env, seed=0)
    # episode passes through the road stage and terminates with all three
    # reward channels populated
    assert info['road_network'] > 0
    assert info['life_circle'] > 0
    assert info['greenness'] > 0
    assert steps > 20


def test_episode_deterministic_given_seed(grid_env):
    r1 = run_random_episode(grid_env, seed=7)
    r2 = run_random_episode(grid_env, seed=7)
    assert r1[0] == r2[0]
    assert r1[1] == pytest.approx(r2[1])
    assert r1[2] == pytest.approx(r2[2])


def test_full_episode_hlg():
    env = make_env('hlg')
    steps, final_r, total, info = run_random_episode(env, seed=0)
    # skip_road: road network untouched, land-use rewards populated
    assert info['road_network'] == -1.0
    assert info['life_circle'] > 0
    assert info['greenness'] > 0


def test_concept_reward_hlg_concept():
    env = make_env('hlg_concept')
    steps, final_r, total, info = run_random_episode(env, seed=0)
    assert info['concept'] >= 0.0


def test_stats_track_placements(grid_env):
    grid_env.reset()
    plc = grid_env._plc
    ratio0, count0 = plc.get_plan_ratio_and_count()
    land_use, mask = plc.get_current_land_use_and_mask()
    action = int(np.nonzero(mask)[0][0])
    plc.place_land_use(land_use, action)
    ratio1, count1 = plc.get_plan_ratio_and_count()
    # something was placed: feasible ratio decreased, some type's count rose
    assert ratio1[city_config.FEASIBLE] < ratio0[city_config.FEASIBLE]
    assert count1.sum() == count0.sum() + 1


def test_score_plan_roundtrip(grid_env):
    run_random_episode(grid_env, seed=3)
    snapshot = grid_env.snapshot_land_use()
    env2 = make_env('grid')
    env2.load_plan(snapshot)
    reward, info = env2.score_plan(verbose=False)
    assert np.isfinite(reward)
    assert 'road_network_info' in info and 'life_circle_info' in info
