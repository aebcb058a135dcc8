"""Hand-computed reward fixtures, asserted against BOTH engines.

The parity goldens elsewhere compare the two tiers against each other;
these fixtures anchor both to numbers derived BY HAND from the reference
formulas (reference plan_client.py:833-967) on tiny synthetic plans in the
grid scenario frame (240x240 cells of 10 m, community area 5.76 km²):

  * road network: isolated short road + L-shaped long road + square loop
    enclosing one >800 m block
  * life circle: one residential block, one in-range school, one
    out-of-range business
  * greenness: full coverage (adjacent big green) and zero coverage
    (green below the 2000 m² threshold)
"""
import numpy as np
import pytest

from urban_tpu import city_config as cc
from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.envs.plan_table import GeoTable
from urban_tpu.geometry.base import Geometry, LINE, POLY
from urban_tpu.jaxenv import step as js
from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
from urban_tpu.utils.config import Config


def _square(x0, y0, w, h):
    return Geometry(POLY, np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]],
        dtype=np.float64))


def _line(*coords):
    return Geometry(LINE, np.array(coords, dtype=np.float64))


def _make(cfg, geoms, types):
    table = GeoTable(list(range(len(geoms))), types, [True] * len(geoms),
                     geoms)
    table.compute_domain_features()
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    plc._init_table = table
    plc.unplan_all_land_use()
    spec = build_env_spec(cfg, plc, max_steps=4)
    state = build_initial_state(spec, plc)
    return plc, spec, state


@pytest.fixture(scope='module')
def cfg():
    return Config('grid', 0, tmp=True)


def test_road_network_fixture(cfg):
    """Hand computation (coordinates in 10 m cells):
    A: 5-cell isolated segment              -> 50 m road, short, 2 dead ends
    B: L of 40 + 40 cells (deg-2 corner)    -> merged 800 m road, long,
                                               2 dead ends
    C: closed 100-cell square loop          -> one merged 4000 m road (cycle
                                               of deg-2 nodes), 0 dead ends,
                                               encloses one 1000x1000 m block
    connectivity = 1/3           (three components)
    density      = 4.85 km / 5.76 km² / 10 = 0.0842014
    dead ends    = 4  -> 1/5
    short roads  = 1  -> 1/2
    long roads   = 2  -> 1/3
    large blocks = 1  -> 1/2
    reward = (1/3 + 0.0842014 + 0.2 + 0.5 + 1/3 + 0.5) / 6 = 0.3252336
    """
    geoms = [
        _line((10, 200), (15, 200)),                       # A
        _line((200, 10), (240 - 0.0, 10), (240.0, 50)),    # B (40+40 cells)
        _line((20, 20), (120, 20), (120, 120), (20, 120), (20, 20)),  # C
    ]
    plc, spec, state = _make(cfg, geoms, [cc.ROAD] * 3)
    expected = (1 / 3 + (0.05 + 0.8 + 4.0) / 5.76 / 10 + 1 / 5 + 1 / 2
                + 1 / 3 + 1 / 2) / 6

    host, info = plc.get_road_network_reward()
    assert host == pytest.approx(expected, abs=1e-6)
    assert info['connectivity_reward'] == pytest.approx(1 / 3)
    assert info['dead_end_penalty'] == pytest.approx(1 / 5)
    assert info['short_road_penalty'] == pytest.approx(1 / 2)
    assert info['long_road_penalty'] == pytest.approx(1 / 3)
    assert info['road_distance_penalty'] == pytest.approx(1 / 2)

    jit = float(js.road_network_reward(spec, state))
    assert jit == pytest.approx(expected, abs=1e-5)


def test_life_circle_fixture(cfg):
    """One residential block at (100..110)², a school 30 cells (300 m) to
    the right (within 500 m), a business 100 cells (1000 m) away (outside).
    Two service groups present -> life10 = (1 + 0)/2 = 0.5; single-member
    groups give no decentralization term. reward = 0.5."""
    geoms = [
        _square(100, 100, 10, 10),          # residential, centroid (105,105)
        _square(130, 100, 10, 10),          # school, centroid (135,105)
        _square(200, 100, 10, 10),          # business, centroid (205,105)
    ]
    plc, spec, state = _make(
        cfg, geoms, [cc.RESIDENTIAL, cc.SCHOOL, cc.BUSINESS])
    host, info = plc.get_life_circle_reward()
    assert host == pytest.approx(0.5, abs=1e-9)
    jit = float(js.life_circle_reward(spec, state))
    assert jit == pytest.approx(0.5, abs=1e-6)


def test_life_circle_decentralization_fixture(cfg):
    """Two schools 100 cells apart add the decentralization bonus:
    efficiency = 1 (school within 500 m), decentral = 0.05 * (1000 m pair
    distance in cells / diag(240√2)) = 0.05 * 100/339.41 = 0.0147314."""
    geoms = [
        _square(100, 100, 10, 10),          # residential
        _square(130, 100, 10, 10),          # school 1 (in range)
        _square(230, 100, 10, 10),          # school 2, 100 cells from s1
    ]
    plc, spec, state = _make(cfg, geoms,
                             [cc.RESIDENTIAL, cc.SCHOOL, cc.SCHOOL])
    diag = np.sqrt(240.0 ** 2 + 240.0 ** 2)
    expected = 1.0 + 0.05 * (100.0 / diag)
    host, info = plc.get_life_circle_reward()
    assert host == pytest.approx(expected, abs=1e-9)
    jit = float(js.life_circle_reward(spec, state))
    assert jit == pytest.approx(expected, abs=1e-5)


def test_greenness_fixture_full_and_zero(cfg):
    """(a) residential 20x20 cells with a 10x10-cell green (10000 m² >=
    2000 m² threshold) sharing its left edge: every residential point is
    within 300 m of the green boundary (max distance = diag of 200 m
    square = 283 m) -> coverage exactly 1.
    (b) the only green is 4x4 cells = 1600 m² < 2000 m² threshold ->
    reward 0."""
    geoms = [_square(100, 100, 20, 20), _square(90, 100, 10, 20)]
    plc, spec, state = _make(cfg, geoms, [cc.RESIDENTIAL, cc.GREEN_L])
    host = plc.get_greenness_reward()
    assert host == pytest.approx(1.0, abs=1e-6)
    jit = float(js.greenness_reward(spec, state))
    assert jit == pytest.approx(1.0, abs=1e-6)

    geoms = [_square(100, 100, 20, 20), _square(90, 100, 4, 4)]
    plc, spec, state = _make(cfg, geoms, [cc.RESIDENTIAL, cc.GREEN_L])
    assert plc.get_greenness_reward() == pytest.approx(0.0, abs=1e-9)
    assert float(js.greenness_reward(spec, state)) == pytest.approx(
        0.0, abs=1e-9)


def test_large_block_serpentine(cfg):
    """Adversarial face decomposition: a serpentine road corridor whose
    single face has a geodesic depth far beyond the old fixed-iteration
    neighbor flood (regression: under-merged fragments each counted as a
    large block). The comb below carves one connected winding face inside
    a 110x110-cell frame: bbox > 800 m on both axes -> exactly ONE large
    block; host polygonize agrees."""
    # outer frame 110x110 cells (1100 m)
    x0, y0, s = 10, 10, 110
    geoms = [
        _line((x0, y0), (x0 + s, y0)),
        _line((x0 + s, y0), (x0 + s, y0 + s)),
        _line((x0 + s, y0 + s), (x0, y0 + s)),
        _line((x0, y0 + s), (x0, y0)),
    ]
    # comb teeth every 10 cells, alternating from bottom/top, leaving a
    # 4-cell gap: the interior stays ONE face but its geodesic path snakes
    # ~ (s/10) * s cells
    for i, tx in enumerate(range(x0 + 10, x0 + s, 10)):
        if i % 2 == 0:
            geoms.append(_line((tx, y0), (tx, y0 + s - 4)))
        else:
            geoms.append(_line((tx, y0 + 4), (tx, y0 + s)))
    types = [cc.ROAD] * len(geoms)
    plc, spec, state = _make(cfg, geoms, types)

    is_road = np.asarray(state.seg_alive) & \
        (np.asarray(state.seg_type) == cc.ROAD)
    n_large = int(js._large_block_count(spec, state,
                                        np.asarray(is_road)))
    assert n_large == 1

    # host oracle: polygonize-based large-block count inside the road
    # reward; compare the full reward channel too
    r_host = plc.get_road_network_reward()[0]
    r_jit = float(js.road_network_reward(spec, state))
    assert r_jit == pytest.approx(r_host, abs=1e-2)
