"""Tests for utility modules: params, schedules, checkpointing, stats."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from urban_tpu.utils.params import (count_params, get_flat_params,
                                    lr_schedule, set_flat_params)
from urban_tpu.utils.checkpoint import (load_pickle_checkpoint,
                                        orbax_available,
                                        save_orbax_checkpoint,
                                        load_orbax_checkpoint,
                                        save_pickle_checkpoint)
from urban_tpu.utils.stats import LoggerRL, StatsLogger


def test_flat_params_roundtrip():
    tree = {'a': jnp.ones((3, 2)), 'b': {'c': jnp.arange(4.0)}}
    flat = get_flat_params(tree)
    assert flat.shape == (10,)
    assert count_params(tree) == 10
    tree2 = set_flat_params(tree, flat * 2)
    assert np.allclose(np.asarray(tree2['a']), 2.0)


def test_lr_schedules():
    for kind in ('constant', 'linear', 'cosine', 'step'):
        sched = lr_schedule(kind, 1e-3, 100, warmup_steps=10)
        v0 = float(sched(0))
        v_mid = float(sched(50))
        assert np.isfinite(v0) and np.isfinite(v_mid)


def test_pickle_checkpoint_roundtrip(tmp_path):
    payload = {'params': {'w': jnp.ones((2, 2))}, 'iteration': 7}
    path = str(tmp_path / 'cp.p')
    save_pickle_checkpoint(path, payload)
    loaded = load_pickle_checkpoint(path)
    assert loaded['iteration'] == 7
    assert np.allclose(loaded['params']['w'], 1.0)


@pytest.mark.skipif(not orbax_available(), reason='orbax not installed')
def test_orbax_checkpoint_roundtrip(tmp_path):
    tree = {'w': jnp.arange(6.0).reshape(2, 3), 'step': jnp.asarray(3)}
    assert save_orbax_checkpoint(str(tmp_path), 5, tree)
    restored = load_orbax_checkpoint(str(tmp_path), 5, jax.device_get(tree))
    assert np.allclose(np.asarray(restored['w']),
                       np.arange(6.0).reshape(2, 3))


def test_stats_logger_merge():
    a, b = StatsLogger(), StatsLogger()
    for v in (1.0, 2.0):
        a.log(v)
    b.log(10.0)
    merged = StatsLogger.merge([a, b])
    assert merged.avg() == pytest.approx(13.0 / 3)
    assert merged.min() == 1.0 and merged.max() == 10.0


def test_logger_rl_channels():
    lg = LoggerRL()
    lg.start_episode()
    lg.step(None, 0.5, {})
    lg.end_episode({'road_network': 0.7, 'life_circle': 0.6,
                    'greenness': 0.4})
    merged = LoggerRL.merge([lg])
    assert merged.avg_episode_reward == pytest.approx(0.5)
    assert merged.avg_episode_road_network_reward == pytest.approx(0.7)
