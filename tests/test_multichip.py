"""Data-parallel mesh tests on the conftest-forced 8-device CPU mesh.

Validates the multi-chip path the driver dry-runs (__graft_entry__.
dryrun_multichip): mesh construction, batch sharding, and the shard_map PPO
update — including that the dp update reproduces the single-device global
loss semantics exactly (the weighted numerators are psum'd before dividing,
so uneven exploration-row counts across shards do not skew per-row weights).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from urban_tpu.utils.config import Config
from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
from urban_tpu.jaxenv.step import build_obs
from urban_tpu.jaxenv.rollout import broadcast_state
from urban_tpu.models.model import create_model
from urban_tpu.parallel.mesh import (make_dp_ppo_update, make_mesh,
                                     replicate, shard_batch)
from urban_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_loss

N_DEV = 8


@pytest.fixture(scope='module')
def setup():
    cfg = Config('hlg', 0, tmp=True)
    plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
    spec = build_env_spec(cfg, plc, max_steps=cfg.max_sequence_length)
    state = build_initial_state(spec, plc)
    cfg.state_encoder_specs = dict(cfg.state_encoder_specs)
    cfg.state_encoder_specs['max_num_nodes'] = spec.num_features
    cfg.state_encoder_specs['max_num_edges'] = spec.NE
    model = create_model(cfg, 'sgnn')
    obs0 = jax.tree.map(lambda x: x[None], build_obs(spec, state))
    params = model.init(jax.random.PRNGKey(0), obs0)
    return cfg, spec, state, model, params


def _batch(spec, state, model, params, n, seed=0):
    """A synthetic flat PPO batch of n rows from the initial observation."""
    rng = np.random.default_rng(seed)
    obs1 = build_obs(spec, state)
    obs = tuple(jnp.broadcast_to(o[None], (n,) + o.shape) for o in obs1)
    lu = np.flatnonzero(np.asarray(obs1[6]))
    actions = jnp.asarray(
        np.stack([rng.choice(lu, size=n),
                  rng.integers(0, spec.num_features, size=n)], axis=1),
        dtype=jnp.int32)
    log_probs, _, values = model.apply(params, obs, actions,
                                       method='log_prob_entropy_value')
    returns = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    advantages = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    # uneven exploration rows: first half of the batch only -> shards get
    # different exps counts, which is exactly the case the psum
    # normalization must handle
    exps = jnp.asarray((np.arange(n) < n // 2).astype(np.float32))
    valid = jnp.ones(n, jnp.float32)
    return obs, actions, returns, advantages, log_probs, exps, valid


def test_make_mesh_asserts_device_count():
    assert len(jax.devices()) >= N_DEV
    mesh = make_mesh(N_DEV)
    assert mesh.devices.size == N_DEV
    with pytest.raises(ValueError):
        make_mesh(len(jax.devices()) + 1)


def test_shard_batch_shards_leading_axis(setup):
    cfg, spec, state, model, params = setup
    mesh = make_mesh(N_DEV)
    x = jnp.arange(N_DEV * 4, dtype=jnp.float32).reshape(N_DEV * 4, 1)
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == N_DEV
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


@pytest.mark.slow
def test_dp_update_matches_single_device(setup):
    """The 8-shard dp update must produce the same params as a single-device
    step on the full batch (global weighted-mean loss semantics)."""
    cfg, spec, state, model, params = setup
    mesh = make_mesh(N_DEV)
    n = N_DEV * 4
    batch = _batch(spec, state, model, params, n)
    obs, actions, returns, advantages, fixed_lp, exps, valid = batch
    ppo_cfg = PPOConfig(lr=1e-2, clip_epsilon=0.2)
    optimizer = make_optimizer(ppo_cfg)

    # single-device reference gradient on the full batch
    grads_ref = jax.grad(
        lambda p: ppo_loss(model, p, obs, actions, returns, advantages,
                           fixed_lp, exps, ppo_cfg, valid)[0])(params)

    # dp gradient: per-shard local-contribution grads, psum'd
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def dp_grads(params, obs, actions, returns, advantages, fixed_lp, exps,
                 valid):
        g = jax.grad(
            lambda p: ppo_loss(model, p, obs, actions, returns, advantages,
                               fixed_lp, exps, ppo_cfg, valid,
                               axis_name='dp')[0])(params)
        return jax.lax.psum(g, 'dp')

    obs_spec = tuple([P('dp')] * 9)
    f = shard_map(dp_grads, mesh=mesh,
                  in_specs=(P(), obs_spec, P('dp'), P('dp'), P('dp'),
                            P('dp'), P('dp'), P('dp')),
                  out_specs=P(), check_rep=False)
    grads_dp = jax.jit(f)(
        replicate(mesh, params), shard_batch(mesh, obs),
        *shard_batch(mesh, (actions, returns, advantages, fixed_lp, exps,
                            valid)))
    # the semantic bug this guards against (psum double counting: an
    # n_shards factor on every gradient) shows up as 8x differences. Leaves
    # whose backward flows through the bf16 aggregation matmuls
    # (node_encoder/edge_fc) carry ~2e-4 bf16 rounding that depends on the
    # batch tiling; everything else agrees to ~1e-8. Comparing post-Adam
    # params would be ill-conditioned (rsqrt amplifies grad noise at init).
    for a, b in zip(jax.tree.leaves(grads_ref),
                    jax.tree.leaves(jax.device_get(grads_dp))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2,
                                   atol=5e-4)

    # one full dp optimizer step: finite loss, params stay replicated
    dp_update = make_dp_ppo_update(model, optimizer, ppo_cfg, mesh)
    params_dp = replicate(mesh, params)
    opt_dp = replicate(mesh, optimizer.init(params))
    params_dp, opt_dp, stats = dp_update(
        params_dp, opt_dp, shard_batch(mesh, obs),
        *shard_batch(mesh, (actions, returns, advantages, fixed_lp, exps,
                            valid)))
    assert np.isfinite(float(np.asarray(stats['loss'])))
    leaf = jax.tree.leaves(params_dp)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for arr in shards[1:]:
        np.testing.assert_array_equal(shards[0], arr)


@pytest.mark.slow
def test_failed_batch_produces_zero_gradient(setup):
    """Rows excluded by the success filter (valid=0, exps=0) must not train
    anything — matching the reference, whose memory never contains them
    (urban_planning_agent.py:75-86)."""
    cfg, spec, state, model, params = setup
    n = 8
    obs, actions, returns, advantages, fixed_lp, _, _ = _batch(
        spec, state, model, params, n)
    zeros = jnp.zeros(n, jnp.float32)
    ppo_cfg = PPOConfig()
    grads = jax.grad(
        lambda p: ppo_loss(model, p, obs, actions, returns, advantages,
                           fixed_lp, zeros, ppo_cfg, zeros)[0])(params)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total == 0.0


@pytest.mark.slow
def test_tpu_trainer_two_iterations_on_mesh(setup):
    """Full trainer loop on the 8-device mesh: runs, params stay replicated
    and identical across devices."""
    from urban_tpu.rl.train_tpu import TPUTrainer
    cfg = Config('hlg', 0, tmp=True)
    mesh = make_mesh(N_DEV)
    trainer = TPUTrainer(cfg, num_envs=N_DEV * 2, rollout_len=3, mesh=mesh)
    for it in range(2):
        stats = trainer.train_iteration(it)
    leaf = jax.tree.leaves(trainer.params)[0]
    assert len(leaf.sharding.device_set) == N_DEV
    per_dev = [np.asarray(s.data) for s in leaf.addressable_shards]
    for arr in per_dev[1:]:
        np.testing.assert_array_equal(per_dev[0], arr)


@pytest.mark.slow
def test_run_training_cli_driver_on_mesh(setup, tmp_path):
    """End-to-end CLI-driver path on the 8-device mesh: run_training with
    num_devices=8 (the --num_devices flag's target) trains two iterations
    data-parallel, writes a checkpoint, and greedy-eval runs. This is the
    one-command multi-chip training path — the TPU-native replacement for
    the reference's 20-worker sampler fan-out (reference
    khrylib/rl/agents/agent.py:75-100)."""
    import glob
    import os
    from urban_tpu.rl.train_tpu import run_training
    cfg = Config('hlg', 0, tmp=True)
    cfg.save_model_interval = 2
    trainer = run_training(cfg, iterations=2, num_envs=N_DEV * 2,
                           separate_train=False, eval_envs=N_DEV,
                           use_tensorboard=False, rollout_len=3,
                           num_devices=N_DEV)
    assert trainer.mesh is not None and trainer.mesh.devices.size == N_DEV
    leaf = jax.tree.leaves(trainer.params)[0]
    assert len(leaf.sharding.device_set) == N_DEV
    ckpts = glob.glob(os.path.join(cfg.model_dir, '*.p'))
    assert ckpts, f'no checkpoint written under {cfg.model_dir}'


def test_run_training_rejects_uneven_envs(setup):
    from urban_tpu.rl.train_tpu import run_training
    cfg = Config('hlg', 0, tmp=True)
    with pytest.raises(ValueError, match='divisible'):
        run_training(cfg, iterations=1, num_envs=N_DEV + 1,
                     separate_train=False, eval_envs=0,
                     use_tensorboard=False, rollout_len=3,
                     num_devices=N_DEV)
