"""TPU-native PPO trainer: batched on-device rollouts + data-parallel update.

This is the performance path that replaces the reference's 20-process CPU
sampler + single-GPU update (reference: urban_planning/train.py, SURVEY.md
§2.3): environments are vmapped on device and sharded across the mesh's
``dp`` axis, trajectories never leave the chip, GAE runs as a scan, and the
PPO update consumes the on-device trajectory buffer in jitted minibatch steps
(psum-averaged gradients under shard_map when the mesh has >1 device).
"""
from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.jaxenv.rollout import (batched_gae, broadcast_state,
                                      episode_success_weights, rollout)
from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
from urban_tpu.models.model import create_mlp_model, create_sgnn_model
from urban_tpu.parallel.mesh import make_dp_ppo_update, make_mesh, replicate, \
    shard_batch
from urban_tpu.rl.ppo import PPOConfig, make_optimizer, ppo_update_step
from urban_tpu.utils.config import Config
from urban_tpu.utils.logger import create_logger


@dataclass
class TrainStats:
    iteration: int
    episodes: int
    failures: int
    mean_episode_reward: float
    success_frac: float
    steps_per_sec: float
    update_time: float


class TPUTrainer:

    def __init__(self, cfg: Config, num_envs: Optional[int] = None,
                 rollout_len: Optional[int] = None, mesh=None,
                 encoder: str = 'sgnn'):
        self.cfg = cfg
        self.plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
        self.spec = build_env_spec(cfg, self.plc,
                                   max_steps=cfg.max_sequence_length)
        self.init_state = build_initial_state(self.spec, self.plc)
        self.num_envs = num_envs or cfg.rollout_specs.get('num_envs', 256)
        self.rollout_len = rollout_len or cfg.max_sequence_length
        self.mesh = mesh
        self.logger = create_logger(os.path.join(cfg.log_dir,
                                                 'log_train_tpu.txt'))

        # slot-layout observations: nodes = feature slots, edges = edge slots
        cfg.state_encoder_specs = dict(cfg.state_encoder_specs)
        cfg.state_encoder_specs['max_num_nodes'] = self.spec.num_features
        cfg.state_encoder_specs['max_num_edges'] = self.spec.NE
        self.model = create_sgnn_model(cfg) if encoder == 'sgnn' \
            else create_mlp_model(cfg)
        from urban_tpu.jaxenv.step import build_obs
        obs0 = jax.tree.map(lambda x: x[None], build_obs(self.spec,
                                                         self.init_state))
        self.params = self.model.init(jax.random.PRNGKey(cfg.seed), obs0)
        self.ppo_cfg = PPOConfig(clip_epsilon=cfg.clip_epsilon,
                                 value_pred_coef=cfg.value_pred_coef,
                                 entropy_coef=cfg.entropy_coef,
                                 grad_clip=1.0, lr=cfg.lr, eps=cfg.eps,
                                 weight_decay=cfg.weightdecay)
        self.optimizer = make_optimizer(self.ppo_cfg)
        self.opt_state = self.optimizer.init(self.params)
        if self.mesh is not None:
            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)
            self.dp_update = make_dp_ppo_update(self.model, self.optimizer,
                                                self.ppo_cfg, self.mesh)
        self.env_states = broadcast_state(
            self.init_state.replace(done=jnp.asarray(True)), self.num_envs)
        if self.mesh is not None:
            self.env_states = shard_batch(self.mesh, self.env_states)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.best_reward = -1000.0

    # ------------------------------------------------------------------
    def collect(self):
        self.rng, sub = jax.random.split(self.rng)
        self.env_states, traj = rollout(
            self.spec, self.model, self.params, self.init_state,
            self.env_states, sub, self.rollout_len)
        return traj

    def update(self, traj, iteration: int):
        T, B = traj.rewards.shape
        weights = episode_success_weights(traj.dones, traj.failures,
                                          traj.rewards)
        advantages, returns = batched_gae(traj.rewards, traj.dones,
                                          traj.values, self.cfg.gamma,
                                          self.cfg.tau)
        n = T * B
        flat_obs = tuple(o.reshape((n,) + o.shape[2:]) for o in traj.obs)
        actions = traj.actions.reshape(n, 2)
        returns = returns.reshape(n, 1)
        advantages = advantages.reshape(n, 1)
        fixed_lp = traj.log_probs.reshape(n, 1)
        # success filter * exploration indicator for the surrogate/entropy;
        # the raw success filter alone for the value loss (reference memory
        # holds only successful-episode rows — greedy steps included —
        # urban_planning_agent.py:75-86)
        valid = weights.reshape(n)
        exps = (traj.exps * weights).reshape(n)

        mb = min(self.cfg.mini_batch_size, n)
        num_mb = max(n // mb, 1)
        rng = np.random.default_rng(self.cfg.seed + iteration)
        for _ in range(self.cfg.num_optim_epoch):
            perm = rng.permutation(n)
            if self.mesh is None:
                # whole shuffled epoch as one XLA program
                from urban_tpu.rl.ppo import ppo_update_epoch
                self.params, self.opt_state, stats = ppo_update_epoch(
                    self.model, self.optimizer, self.ppo_cfg, self.params,
                    self.opt_state, flat_obs, actions, returns, advantages,
                    fixed_lp, exps, jnp.asarray(perm), num_mb, mb, valid)
            else:
                for i in range(num_mb):
                    idx = jnp.asarray(perm[i * mb:(i + 1) * mb])
                    obs_b = tuple(o[idx] for o in flat_obs)
                    args = (obs_b, actions[idx], returns[idx],
                            advantages[idx], fixed_lp[idx], exps[idx],
                            valid[idx])
                    self.params, self.opt_state, stats = self.dp_update(
                        self.params, self.opt_state, *args)
        return stats

    def train_iteration(self, iteration: int) -> TrainStats:
        t0 = time.time()
        traj = self.collect()
        jax.block_until_ready(traj.rewards)
        t1 = time.time()
        dones = np.asarray(traj.dones)
        fails = np.asarray(traj.failures)
        rewards = np.asarray(traj.rewards)
        weights = np.asarray(episode_success_weights(
            traj.dones, traj.failures, traj.rewards))
        term = dones & ~fails
        mean_ep = float(rewards[term].mean()) if term.any() else -1.0
        stats = self.update(traj, iteration)
        jax.block_until_ready(stats['loss'])
        t2 = time.time()
        n_steps = traj.rewards.size
        out = TrainStats(
            iteration=iteration, episodes=int(dones.sum()),
            failures=int(fails.sum()), mean_episode_reward=mean_ep,
            success_frac=float(weights.mean()),
            steps_per_sec=n_steps / max(t1 - t0, 1e-9),
            update_time=t2 - t1)
        self.logger.info(
            f'{iteration}\tT_sample {t1 - t0:.2f}\tT_update {t2 - t1:.2f}\t'
            f'steps/s {out.steps_per_sec:.0f}\teps {out.episodes}\t'
            f'fail {out.failures}\tR_eps {mean_ep:.3f}\t{self.cfg.id}')
        if mean_ep > self.best_reward:
            self.best_reward = mean_ep
        return out

    def save_checkpoint(self, iteration: int) -> None:
        path = os.path.join(self.cfg.model_dir,
                            f'tpu_iteration_{iteration:04d}.p')
        with open(path, 'wb') as f:
            pickle.dump({'params': jax.device_get(self.params),
                         'opt_state': jax.device_get(self.opt_state),
                         'iteration': iteration,
                         'best_reward': self.best_reward}, f)


def main():
    from absl import app, flags
    flags.DEFINE_string('cfg', None, 'Config id.')
    flags.DEFINE_integer('global_seed', 0, 'Seed.')
    flags.DEFINE_integer('num_envs', 0, 'Vectorized envs (0 = cfg default).')
    flags.DEFINE_integer('iterations', 10, 'Training iterations.')
    flags.DEFINE_bool('tmp', True, 'Temporary storage.')
    FLAGS = flags.FLAGS

    def run(_):
        cfg = Config(FLAGS.cfg, FLAGS.global_seed, FLAGS.tmp)
        trainer = TPUTrainer(cfg,
                             num_envs=FLAGS.num_envs or None)
        for it in range(FLAGS.iterations):
            trainer.train_iteration(it)
            if (it + 1) % cfg.save_model_interval == 0:
                trainer.save_checkpoint(it)

    flags.mark_flags_as_required(['cfg'])
    app.run(run)


if __name__ == '__main__':
    main()


def freeze_land_use_trainer(trainer: TPUTrainer, table) -> TPUTrainer:
    """Two-phase curriculum for the TPU path: rebuild the trainer's spec and
    initial state around a frozen land-use plan and switch to road-only
    training (reference urban_planning_agent.py:214-221 / config.py:71-75)."""
    cfg = trainer.cfg
    cfg.finetune()
    trainer.plc.freeze_land_use(table)
    trainer.plc.unplan_all_land_use()
    from urban_tpu.jaxenv.state import build_env_spec, build_initial_state
    trainer.spec = build_env_spec(cfg, trainer.plc,
                                  max_steps=cfg.max_sequence_length)
    trainer.init_state = build_initial_state(trainer.spec, trainer.plc)
    from urban_tpu.jaxenv.rollout import broadcast_state
    import jax.numpy as jnp
    trainer.env_states = broadcast_state(
        trainer.init_state.replace(done=jnp.asarray(True)), trainer.num_envs)
    if trainer.mesh is not None:
        from urban_tpu.parallel.mesh import shard_batch
        trainer.env_states = shard_batch(trainer.mesh, trainer.env_states)
    return trainer
