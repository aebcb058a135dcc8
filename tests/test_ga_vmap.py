"""Vmapped GA population evaluation on the jitted env."""
import numpy as np
import jax.numpy as jnp
import pytest

from urban_tpu.envs.city import CityEnv
from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
from urban_tpu.models.baseline import GAPolicy, ga_logits_jax
from urban_tpu.rl.ga import make_ga_population_fitness
from urban_tpu.utils.config import Config


def test_ga_logits_match_host_policy():
    """ga_logits_jax reproduces GAPolicy's linear scoring: same argmax
    action on the same observation arrays."""
    cfg = Config('hlg', 0, tmp=True)
    env = CityEnv(cfg)
    obs = env.reset()
    rng = np.random.default_rng(3)
    for trial in range(5):
        gene = rng.uniform(-5, 5, size=47)
        host_action = GAPolicy().select_action(obs, gene, rng,
                                               mean_action=True)
        obs_j = [jnp.asarray(o) for o in obs]
        obs_j[2] = jnp.asarray(np.asarray(obs[2], dtype=np.int32))
        lu_logits, rd_logits = ga_logits_jax(tuple(obs_j), jnp.asarray(gene))
        lu = int(jnp.argmax(jnp.where(obs_j[6], lu_logits, -jnp.inf)))
        assert lu == int(host_action[0])


def test_ga_population_fitness_vmapped():
    """Whole-population fitness in one jitted call: finite scores, failures
    mapped to -1, plausible HLG reward range."""
    cfg = Config('hlg', 111, tmp=True, agent='ga')
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
    init_state = build_initial_state(spec, plc)
    pf = make_ga_population_fitness(spec, init_state, num_steps=45,
                                    seed=111)
    genes = np.random.default_rng(0).uniform(-5, 5, size=(6, 47))
    f = pf(genes)
    assert f.shape == (6,)
    assert np.isfinite(f).all()
    ok = f > 0
    assert ok.any()
    assert ((f[ok] > 2.0) & (f[ok] < 4.5)).all()
    assert ((f[~ok] == -1.0)).all()
