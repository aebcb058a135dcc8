"""Orchestrator tests: training loop, checkpoint/resume, PG update, GA."""
import numpy as np
import pytest

from urban_tpu.utils.config import Config
from urban_tpu.utils.io import load_yaml


def tiny_cfg(**over):
    cfg_dict = load_yaml('urban_tpu/cfg/**/grid.yaml')
    cfg_dict.update(dict(num_episodes_per_iteration=1, max_sequence_length=25,
                         mini_batch_size=16, save_model_interval=1))
    cfg_dict.update(over)
    return Config('grid', 0, tmp=True, cfg_dict=cfg_dict)


@pytest.fixture(scope='module')
def trained_agent():
    from urban_tpu.agents.urban_agent import UrbanPlanningAgent
    cfg = tiny_cfg()
    agent = UrbanPlanningAgent(cfg, training=True)
    agent.freeze_road()
    agent.optimize(0)
    agent.save_checkpoint(0)
    return agent


@pytest.mark.slow
def test_checkpoint_resume(trained_agent):
    import jax
    from urban_tpu.agents.urban_agent import UrbanPlanningAgent
    cfg = tiny_cfg()
    resumed = UrbanPlanningAgent(cfg, training=True, checkpoint=1)
    assert resumed.start_iteration == 1
    # parameters restored exactly
    p1 = jax.tree.leaves(trained_agent.params)
    p2 = jax.tree.leaves(resumed.params)
    for a, b in zip(p1, p2):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert resumed.best_rewards == pytest.approx(trained_agent.best_rewards)


@pytest.mark.slow
def test_best_plan_payload(trained_agent):
    assert len(trained_agent.best_plans) >= 1
    plan = trained_agent.best_plans[0]
    assert 'land_use_gdf' in plan and 'land_use_reward' in plan
    assert 'gdf' in plan


@pytest.mark.slow
def test_ga_policy_fitness(trained_agent):
    gene = np.zeros(2 * trained_agent.node_dim + 1)
    gene[0] = 1.0
    trained_agent.cfg.agent = 'ga'
    trained_agent.setup_model()
    trained_agent.sampler.select_action = trained_agent._select_action_fn()
    fitness, plan = trained_agent.fitness_ga(gene)
    assert np.isfinite(fitness)


def test_pg_update_step():
    import jax
    import jax.numpy as jnp
    from urban_tpu.models.model import create_sgnn_model, dummy_obs
    from urban_tpu.rl.pg import a2c_update_step
    from urban_tpu.rl.ppo import PPOConfig, make_optimizer
    cfg = tiny_cfg()
    model = create_sgnn_model(cfg)
    obs = dummy_obs(cfg, batch=4)
    params = model.init(jax.random.PRNGKey(0), obs)
    ppo_cfg = PPOConfig()
    opt = make_optimizer(ppo_cfg)
    opt_state = opt.init(params)
    actions = jnp.zeros((4, 2), jnp.int32)
    returns = jnp.ones((4, 1))
    advantages = jnp.ones((4, 1))
    exps = jnp.ones(4)
    new_params, opt_state, stats = a2c_update_step(
        model, opt, ppo_cfg, params, opt_state, obs, actions, returns,
        advantages, exps)
    assert np.isfinite(float(stats['loss']))
    # parameters changed
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree.leaves(params),
                                  jax.tree.leaves(new_params)))
    assert changed


def test_ppo_epoch_matches_stepwise():
    import jax
    import jax.numpy as jnp
    from urban_tpu.models.model import create_sgnn_model, dummy_obs
    from urban_tpu.rl.ppo import (PPOConfig, make_optimizer, ppo_update_epoch,
                                  ppo_update_step)
    cfg = tiny_cfg()
    model = create_sgnn_model(cfg)
    obs = dummy_obs(cfg, batch=8)
    params = model.init(jax.random.PRNGKey(0), obs)
    ppo_cfg = PPOConfig()
    opt = make_optimizer(ppo_cfg)
    rng = np.random.default_rng(0)
    actions = jnp.zeros((8, 2), jnp.int32)
    returns = jnp.asarray(rng.normal(size=(8, 1)), dtype=jnp.float32)
    advantages = jnp.asarray(rng.normal(size=(8, 1)), dtype=jnp.float32)
    fixed_lp = jnp.zeros((8, 1))
    exps = jnp.ones(8)
    perm = jnp.arange(8)

    p1, s1, _ = ppo_update_epoch(model, opt, ppo_cfg, params,
                                 opt.init(params), obs, actions, returns,
                                 advantages, fixed_lp, exps, perm, 2, 4)
    # stepwise over the same two minibatches
    p2, s2 = params, opt.init(params)
    for i in range(2):
        idx = perm[i * 4:(i + 1) * 4]
        obs_b = tuple(o[idx] for o in obs)
        p2, s2, _ = ppo_update_step(model, opt, ppo_cfg, p2, s2, obs_b,
                                    actions[idx], returns[idx],
                                    advantages[idx], fixed_lp[idx], exps[idx])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_tpu_trainer_two_phase_freeze():
    """freeze_land_use_trainer must rebuild the model around the regrown
    slot table (the frozen plan changes the observation width; regression:
    phase 2 crashed with an einsum shape mismatch when the phase-1 model
    was kept) and the frozen plan must carry BOUNDARY segments so the road
    stage has candidates (regression: freezing a post-build_all_road state
    left an empty road mask and every episode failed — the reference
    freezes the PRE-conversion snapshot, city.py:461-464)."""
    import logging
    import numpy as np
    from urban_tpu import city_config
    from urban_tpu.envs.city import CityEnv
    from urban_tpu.jaxenv import step as js
    from urban_tpu.rl.train_tpu import TPUTrainer, freeze_land_use_trainer
    from urban_tpu.utils.config import Config
    logger = logging.getLogger('test_two_phase')

    cfg = Config('grid', 0, tmp=True)
    cfg.train()
    # a few host placements so the plan has BOUNDARY segments, as a real
    # phase-1 plan does (with keep_boundaries, the phase-1 jit env keeps
    # them at land-use completion)
    env = CityEnv(cfg)
    obs = env.reset()
    rng = np.random.default_rng(3)
    for _ in range(4):
        a = int(rng.choice(np.nonzero(obs[6])[0]))
        obs, _, done, _ = env.step(np.array([a, 0], dtype=float), logger)
        assert not done
    table = env.snapshot_land_use()
    leftover = table.alive_mask_of(city_config.FEASIBLE)
    table.types[leftover] = city_config.GREEN_S

    tr = TPUTrainer(cfg, num_envs=2, rollout_len=16, eval_envs=2,
                    keep_boundaries=True)
    assert tr.spec.keep_boundaries
    cfg.finetune()
    freeze_land_use_trainer(tr, table)

    assert int(np.asarray(
        js.road_mask(tr.spec, tr.init_state)).sum()) > 0
    assert int(tr.init_state.total_road_steps) > 0
    stats = tr.train_iteration(0, do_eval=False)
    n_steps = 16 * 2
    assert stats.failures < n_steps  # road stage is playable, not all-fail
    assert tr.cfg.state_encoder_specs['max_num_nodes'] == tr.spec.num_features
