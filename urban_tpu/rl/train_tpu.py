"""TPU-native PPO trainer: batched on-device rollouts + data-parallel update.

This is the performance path that replaces the reference's 20-process CPU
sampler + single-GPU update (reference: urban_planning/train.py, SURVEY.md
§2.3): environments are vmapped on device and sharded across the mesh's
``dp`` axis, trajectories never leave the chip, GAE runs as a scan, and the
PPO update consumes the on-device trajectory buffer in jitted minibatch steps
(psum'd gradients under shard_map when the mesh has >1 device).

Orchestration matches the reference agent (urban_planning_agent.py:172-246,
393-400): per-iteration greedy eval, TensorBoard scalars under the reference
tag names, best-plan payloads in checkpoints, and the two-phase
land-use -> road curriculum via --separate_train (reference train.py:64-72).
"""
from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from urban_tpu.envs.plan_client import PlanClient
from urban_tpu.jaxenv.rollout import (batched_gae, broadcast_state,
                                      episode_success_weights, eval_rollout,
                                      rollout)
from urban_tpu.jaxenv.state import (build_env_spec, build_initial_state,
                                    state_to_table)
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
    eval_reward: float = float('nan')


@partial(jax.jit, static_argnames=('spec',))
def _reward_channels(spec, states):
    """Per-env raw reward channels of (batched) terminal states.

    The road channel is only computed on scenarios that actually plan roads
    (reference: skip_road scenarios report road_network 0.0 in the episode
    info, city.py:204-234); on skip_road real scenarios the raster face
    decomposition inside road_network_reward would be built over the full
    2160x2040 1-meter grid, which must never be instantiated."""
    from urban_tpu.jaxenv.step import greenness_reward, life_circle_reward
    life = jax.vmap(lambda s: life_circle_reward(spec, s))(states)
    green = jax.vmap(lambda s: greenness_reward(spec, s))(states)
    if spec.skip_road or spec.road_network_weight <= 0:
        road = jnp.zeros_like(life)
    else:
        from urban_tpu.jaxenv.rollout import batched_road_network_reward
        road = batched_road_network_reward(spec, states)
    return life, green, road


class TPUTrainer:

    def __init__(self, cfg: Config, num_envs: Optional[int] = None,
                 rollout_len: Optional[int] = None, mesh=None,
                 encoder: str = 'sgnn', eval_envs: int = 16,
                 use_tensorboard: bool = False,
                 keep_boundaries: bool = False):
        self.cfg = cfg
        self.plc = PlanClient(cfg.objectives_plan, cfg.init_plan)
        self.spec = build_env_spec(cfg, self.plc,
                                   max_steps=cfg.max_sequence_length,
                                   keep_boundaries=keep_boundaries)
        self.init_state = build_initial_state(self.spec, self.plc)
        self.num_envs = num_envs or cfg.rollout_specs.get('num_envs', 256)
        # the rollout window must cover a full episode (episodes that span
        # the window boundary are excluded from training by the success
        # filter); cfg.train()/finetune() halve max_sequence_length for
        # reference batch-size parity, so size the window from the original
        self.rollout_len = rollout_len or getattr(
            cfg, 'original_max_sequence_length', cfg.max_sequence_length)
        self.eval_envs = eval_envs
        self.mesh = mesh
        if mesh is not None and self.num_envs % mesh.devices.size:
            raise ValueError(
                f'num_envs={self.num_envs} must be divisible by the '
                f'{mesh.devices.size}-device dp mesh (environments shard '
                f'evenly across devices)')
        self.logger = create_logger(os.path.join(cfg.log_dir,
                                                 'log_train_tpu.txt'))
        self.tb = None
        if use_tensorboard:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(cfg.tb_dir)

        self.encoder = encoder
        self.ppo_cfg = PPOConfig(clip_epsilon=cfg.clip_epsilon,
                                 value_pred_coef=cfg.value_pred_coef,
                                 entropy_coef=cfg.entropy_coef,
                                 grad_clip=1.0, lr=cfg.lr, eps=cfg.eps,
                                 weight_decay=cfg.weightdecay)
        self._init_model()
        self._reset_env_batch()
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.best_reward = -1000.0
        self.best_plan_state = None       # single-env PlanState (host)
        self.best_params = None           # params snapshot at best eval
        self.best_iteration = -1          # iteration that achieved best eval
        self.start_iteration = 0
        self.phase = 1                    # 2 after freeze_land_use_trainer
        self.frozen_table = None          # phase-2 frozen land-use plan

    def _init_model(self):
        """(Re)build the model + optimizer around the current spec's slot
        sizes. Called at construction and again by freeze_land_use_trainer:
        freezing the land-use plan regrows the slot table (placed parcels
        become fixed features), so the observation width changes between
        phases — unlike the reference, whose observations are padded to a
        constant max_num_nodes in both phases (hlg.yaml:26-27)."""
        cfg = self.cfg
        # slot-layout observations: nodes = feature slots, edges = edge slots
        cfg.state_encoder_specs = dict(cfg.state_encoder_specs)
        cfg.state_encoder_specs['max_num_nodes'] = self.spec.num_features
        cfg.state_encoder_specs['max_num_edges'] = self.spec.NE
        self.model = create_sgnn_model(cfg) if self.encoder == 'sgnn' \
            else create_mlp_model(cfg)
        from urban_tpu.jaxenv.step import build_obs
        obs0 = jax.tree.map(lambda x: x[None], build_obs(self.spec,
                                                         self.init_state))
        self.params = self.model.init(jax.random.PRNGKey(cfg.seed), obs0)
        self.optimizer = make_optimizer(self.ppo_cfg)
        self.opt_state = self.optimizer.init(self.params)
        if self.mesh is not None:
            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)
            self.dp_update = make_dp_ppo_update(self.model, self.optimizer,
                                                self.ppo_cfg, self.mesh)

    def _reset_env_batch(self):
        self.env_states = broadcast_state(
            self.init_state.replace(done=jnp.asarray(True)), self.num_envs)
        if self.mesh is not None:
            self.env_states = shard_batch(self.mesh, self.env_states)

    # ------------------------------------------------------------------
    def collect(self):
        self.rng, sub = jax.random.split(self.rng)
        self.env_states, traj = rollout(
            self.spec, self.model, self.params, self.init_state,
            self.env_states, sub, self.rollout_len)
        return traj

    def update(self, traj, iteration: int, weights=None):
        T, B = traj.rewards.shape
        if weights is None:
            weights = episode_success_weights(traj.dones, traj.failures)
        advantages, returns = batched_gae(traj.rewards, traj.dones,
                                          traj.values, self.cfg.gamma,
                                          self.cfg.tau)
        # value-bootstrap mixing diagnostic: RMS gap between the critic and
        # the MONTE-CARLO return (gamma, tau=1), regardless of the tau the
        # update trains against. Under tau=0 (the reference default) the TD
        # targets equilibrate one step per update through the bootstrap
        # chain, so this gap — not the TD error — measures how far the
        # chain has actually mixed; it is the metric behind the
        # reference-defaults fidelity question (BASELINE.md round-3/round-5
        # analysis).
        _, mc_returns = batched_gae(traj.rewards, traj.dones, traj.values,
                                    self.cfg.gamma, 1.0)
        w = weights.reshape(-1)
        gap = (traj.values - mc_returns).reshape(-1)
        self.last_value_mc_rms = float(jnp.sqrt(
            jnp.sum(gap * gap * w) / jnp.maximum(jnp.sum(w), 1.0)))
        if self.cfg.agent_specs.get('normalize_advantages', False):
            from urban_tpu.jaxenv.rollout import normalize_advantages
            advantages = normalize_advantages(advantages, weights)
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

    # ------------------------------------------------------------------
    def eval_agent(self, iteration: int):
        """Greedy eval episodes; tracks the best plan (reference
        urban_planning_agent.py:402-467, best-plan tracking :373-400)."""
        start = broadcast_state(self.init_state, self.eval_envs)
        self.rng, sub = jax.random.split(self.rng)
        final, total_r, done, failure = eval_rollout(
            self.spec, self.model, self.params, start, sub, self.rollout_len)
        total_r = np.asarray(total_r)
        done = np.asarray(done)
        failure = np.asarray(failure)
        ok = done & ~failure
        mean_r = float(total_r[ok].mean()) if ok.any() else -1.0
        life, green, road = _reward_channels(self.spec, final)
        chans = {'life_circle': float(np.asarray(life)[ok].mean())
                 if ok.any() else 0.0,
                 'greenness': float(np.asarray(green)[ok].mean())
                 if ok.any() else 0.0,
                 'road_network': float(np.asarray(road)[ok].mean())
                 if ok.any() else 0.0}
        if ok.any():
            best_i = int(np.flatnonzero(ok)[np.argmax(total_r[ok])])
            if total_r[best_i] > self.best_reward:
                self.best_reward = float(total_r[best_i])
                self.best_plan_state = jax.device_get(
                    jax.tree.map(lambda x: x[best_i], final))
                # snapshot the params that PRODUCED the best plan, so
                # tpu_best.p holds best-eval weights even if training
                # later regresses (reference best-checkpoint semantics,
                # urban_planning_agent.py:186-192)
                self.best_params = jax.device_get(self.params)
                self.best_iteration = iteration
        if self.tb is not None:
            self.tb.add_scalar('eval/eval_R_eps_avg', mean_r, iteration)
            for k, v in chans.items():
                self.tb.add_scalar(f'eval/eval_R_{k}_eps_avg', v, iteration)
            self.tb.add_scalar('best_reward/best_reward', self.best_reward,
                               iteration)
        return mean_r, chans

    def best_plan_table(self):
        """Best greedy plan as a host GeoTable (for score_plan / freeze)."""
        if self.best_plan_state is None:
            return None
        return state_to_table(self.best_plan_state)

    # ------------------------------------------------------------------
    def train_iteration(self, iteration: int,
                        do_eval: bool = True) -> TrainStats:
        t0 = time.time()
        traj = self.collect()
        jax.block_until_ready(traj.rewards)
        t1 = time.time()
        dones = np.asarray(traj.dones)
        fails = np.asarray(traj.failures)
        rewards = np.asarray(traj.rewards)
        weights_dev = episode_success_weights(traj.dones, traj.failures)
        weights = np.asarray(weights_dev)
        term = dones & ~fails
        mean_ep = float(rewards[term].mean()) if term.any() else -1.0
        stats = self.update(traj, iteration, weights=weights_dev)
        jax.block_until_ready(stats['loss'])
        t2 = time.time()
        eval_r = float('nan')
        if do_eval:
            eval_r, _ = self.eval_agent(iteration)
        n_steps = traj.rewards.size
        out = TrainStats(
            iteration=iteration, episodes=int(dones.sum()),
            failures=int(fails.sum()), mean_episode_reward=mean_ep,
            success_frac=float(weights.mean()),
            steps_per_sec=n_steps / max(t1 - t0, 1e-9),
            update_time=t2 - t1, eval_reward=eval_r)
        self.logger.info(
            f'{iteration}\tT_sample {t1 - t0:.2f}\tT_update {t2 - t1:.2f}\t'
            f'steps/s {out.steps_per_sec:.0f}\teps {out.episodes}\t'
            f'fail {out.failures}\tR_eps {mean_ep:.3f}\t'
            f'R_eval {eval_r:.3f}\tbest {self.best_reward:.3f}\t'
            f'V_mc_rms {getattr(self, "last_value_mc_rms", float("nan")):.4f}'
            f'\t{self.cfg.id}')
        if self.tb is not None:
            self.tb.add_scalar('train/train_R_eps_avg', mean_ep, iteration)
            for k in ('loss', 'value_loss', 'surr_loss', 'entropy_loss'):
                self.tb.add_scalar(f'loss/{k}',
                                   float(np.asarray(stats[k])), iteration)
            self.tb.add_scalar('diag/value_mc_rms',
                               getattr(self, 'last_value_mc_rms',
                                       float('nan')), iteration)
        return out

    # ------------------------------------------------------------------
    def save_checkpoint(self, iteration: int, tag: str = None) -> None:
        """Pickle checkpoint incl. the best-plan payload (reference
        checkpoint dict, urban_planning_agent.py:172-194). tpu_best.p
        carries the params snapshotted WHEN the best eval was achieved,
        not the latest params (training can regress past its peak)."""
        name = tag or f'tpu_iteration_{iteration:04d}'
        common = {'iteration': iteration,
                  'best_reward': self.best_reward,
                  'best_plan_state': self.best_plan_state,
                  'best_params': self.best_params,
                  'best_iteration': self.best_iteration,
                  'phase': self.phase,
                  'frozen_table': self.frozen_table}
        path = os.path.join(self.cfg.model_dir, f'{name}.p')
        with open(path, 'wb') as f:
            pickle.dump(dict(common, params=jax.device_get(self.params),
                             opt_state=jax.device_get(self.opt_state)), f)
        best = os.path.join(self.cfg.model_dir, 'tpu_best.p')
        with open(best, 'wb') as f:
            # the best payload's iteration is the one that ACHIEVED the best
            # eval (its params are from that point); resuming from tpu_best.p
            # therefore replays training from right after the peak rather
            # than silently continuing a later counter with older weights
            best_it = (self.best_iteration if self.best_iteration >= 0
                       else iteration)
            pickle.dump(dict(common, iteration=best_it,
                             saved_at_iteration=iteration,
                             params=(self.best_params if self.best_params
                                     is not None
                                     else jax.device_get(self.params)),
                             opt_state=None), f)

    def load_checkpoint(self, path,
                        restore_best_reward: bool = True) -> None:
        """path: checkpoint file path, or an already-unpickled dict (avoids
        re-reading params + the pickled GeoTable when the caller peeked)."""
        if isinstance(path, dict):
            ckpt = path
        else:
            with open(path, 'rb') as f:
                ckpt = pickle.load(f)
        self.params = ckpt['params']
        if ckpt.get('opt_state') is not None:
            self.opt_state = ckpt['opt_state']
        if self.mesh is not None:
            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)
        self.start_iteration = ckpt['iteration'] + 1
        self.best_plan_state = ckpt.get('best_plan_state')
        self.best_params = ckpt.get('best_params')
        if restore_best_reward:
            self.best_reward = ckpt['best_reward']
            self.best_iteration = ckpt.get('best_iteration', -1)
        else:
            self.best_reward = -1000.0
            self.best_iteration = -1


def transfer_matching_params(src, dst):
    """Copy every leaf of ``src`` into ``dst`` whose tree path exists in both
    and whose shape matches; returns (new_dst, copied, total) leaf counts.

    Used to carry the land-use-trained trunk into the road phase: the
    reference restores the FULL best phase-1 checkpoint into phase 2
    (urban_planning_agent.py:214-221), trunk included; here the observation
    width changes between phases (the frozen plan regrows the slot table),
    so only the shape-compatible submodules — inner GCN layers, attention,
    value/policy hidden layers — transfer, and input-width-dependent kernels
    re-initialize."""
    src_flat = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_flatten_with_path(src)[0]}
    dst_flat, treedef = jax.tree_util.tree_flatten_with_path(dst)
    out, copied = [], 0
    for path, leaf in dst_flat:
        cand = src_flat.get(jax.tree_util.keystr(path))
        if cand is not None and getattr(cand, 'shape', None) == leaf.shape \
                and getattr(cand, 'dtype', None) == leaf.dtype:
            out.append(cand)
            copied += 1
        else:
            out.append(leaf)
    return treedef.unflatten(out), copied, len(dst_flat)


def freeze_land_use_trainer(trainer: TPUTrainer, table,
                            warm_start_params=None) -> TPUTrainer:
    """Two-phase curriculum for the TPU path: rebuild the trainer's spec and
    initial state around a frozen land-use plan and switch to road-only
    training (reference urban_planning_agent.py:214-221 / config.py:71-75).
    cfg.finetune() must already have been applied.

    warm_start_params: phase-1 params (typically the best-eval snapshot) to
    transfer into the rebuilt model where shapes allow — the TPU analog of
    the reference's load_checkpoint('best') before the road phase."""
    trainer.plc.freeze_land_use(table)
    trainer.plc.unplan_all_land_use()
    trainer.spec = build_env_spec(trainer.cfg, trainer.plc,
                                  max_steps=trainer.cfg.max_sequence_length)
    trainer.init_state = build_initial_state(trainer.spec, trainer.plc)
    # the frozen plan regrows the slot table, so the observation width
    # changes: rebuild the model/optimizer around the new spec, then carry
    # over the shape-compatible phase-1 trunk.
    trainer._init_model()
    if warm_start_params is not None:
        trainer.params, copied, total = transfer_matching_params(
            jax.device_get(warm_start_params), jax.device_get(trainer.params))
        trainer.opt_state = trainer.optimizer.init(trainer.params)
        if trainer.mesh is not None:
            trainer.params = replicate(trainer.mesh, trainer.params)
            trainer.opt_state = replicate(trainer.mesh, trainer.opt_state)
        trainer.logger.info(f'phase 2 warm start: transferred {copied}/'
                            f'{total} param tensors from phase-1 best')
    trainer._reset_env_batch()
    trainer.best_reward = -1000.0
    trainer.best_plan_state = None
    trainer.best_params = None
    trainer.best_iteration = -1
    trainer.phase = 2
    trainer.frozen_table = table
    return trainer


def run_training(cfg: Config, iterations: int, num_envs: Optional[int],
                 separate_train: bool, eval_envs: int = 16,
                 use_tensorboard: bool = True, rollout_len: int = None,
                 resume: str = None, warm_start_phase2: bool = True,
                 num_devices: int = 0, encoder: str = 'sgnn'):
    """Training driver: single-phase, or the reference's two-phase
    land-use -> freeze -> road curriculum (reference train.py:64-72).

    num_devices: 0/1 = single device; N>1 = data-parallel shard_map mesh
    over the first N visible devices; -1 = all visible devices. The
    TPU-native replacement for the reference's 20-worker sampler fan-out
    (reference khrylib/rl/agents/agent.py:75-100) — one flag, not a
    separate launcher."""
    if separate_train:
        cfg.train()
    mesh = None
    if num_devices == -1:
        num_devices = len(jax.devices())
    if num_devices > 1:
        mesh = make_mesh(num_devices)
    trainer = TPUTrainer(cfg, num_envs=num_envs, rollout_len=rollout_len,
                         eval_envs=eval_envs, mesh=mesh, encoder=encoder,
                         use_tensorboard=use_tensorboard,
                         keep_boundaries=separate_train)
    resume_phase = 1
    if resume:
        # a phase-2 checkpoint carries the frozen land-use table and
        # phase-2-shaped params: re-enter phase 2 (rebuild spec + model
        # around the frozen plan) BEFORE installing the params
        with open(resume, 'rb') as f:
            ckpt = pickle.load(f)
        resume_phase = ckpt.get('phase', 1)
        if resume_phase == 2:
            if not separate_train:
                raise ValueError('phase-2 checkpoint requires '
                                 '--separate_train')
            cfg.finetune()
            freeze_land_use_trainer(trainer, ckpt['frozen_table'])
        trainer.load_checkpoint(ckpt)

    if resume_phase == 1:
        for it in range(trainer.start_iteration, iterations):
            trainer.train_iteration(it)
            if (it + 1) % cfg.save_model_interval == 0:
                trainer.save_checkpoint(it)
        trainer.save_checkpoint(iterations - 1, tag='tpu_phase1_final'
                                if separate_train else 'tpu_final')

    if separate_train:
        if resume_phase == 1:
            table = trainer.best_plan_table()
            if table is None:
                trainer.logger.info('no successful plan found in phase 1; '
                                    'skipping road phase')
                return trainer
            # complete the land-use plan exactly as the env's stage
            # transition does: leftover feasible space becomes small green
            from urban_tpu import city_config
            leftover = table.alive_mask_of(city_config.FEASIBLE)
            table.types[leftover] = city_config.GREEN_S
            cfg.finetune()
            trainer.logger.info(f'phase 2 (road): frozen best plan '
                                f'reward={trainer.best_reward:.3f}')
            freeze_land_use_trainer(
                trainer, table,
                warm_start_params=(trainer.best_params if warm_start_phase2
                                   else None))
        start2 = max(iterations, trainer.start_iteration)
        for it in range(start2, 2 * iterations):
            trainer.train_iteration(it)
            if (it + 1) % cfg.save_model_interval == 0:
                trainer.save_checkpoint(it)
        trainer.save_checkpoint(2 * iterations - 1, tag='tpu_phase2_final')
    return trainer


def main():
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from absl import app, flags
    flags.DEFINE_string('cfg', None, 'Config id.')
    flags.DEFINE_integer('global_seed', 0, 'Seed.')
    flags.DEFINE_integer('num_envs', 0, 'Vectorized envs (0 = cfg default).')
    flags.DEFINE_integer('num_devices', 0,
                         'Data-parallel device-mesh size: 0/1 = single '
                         'device, N>1 = shard envs + psum gradients over '
                         'the first N devices, -1 = all visible devices.')
    flags.DEFINE_integer('iterations', 10, 'Training iterations per phase.')
    flags.DEFINE_integer('eval_envs', 16, 'Greedy eval episodes/iteration.')
    flags.DEFINE_integer('rollout_len', 0,
                         'Rollout window (0 = episode cap).')
    flags.DEFINE_bool('separate_train', False,
                      'Two-phase land-use -> road curriculum.')
    flags.DEFINE_bool('tensorboard', True, 'Write TensorBoard scalars.')
    flags.DEFINE_bool('normalize_advantages', False,
                      'Standardize advantages over training rows '
                      '(agent_specs.normalize_advantages; the reference '
                      'exposes the same dormant switch).')
    flags.DEFINE_float('tau', -1.0,
                       'GAE lambda override (<0 = cfg value). The scenario '
                       'yamls pin the reference tau=0.0 (pure TD); tau '
                       'near 1 gives Monte-Carlo advantages, better '
                       'conditioned for the terminal-sparse stage rewards.')
    flags.DEFINE_float('lr', -1.0, 'Learning-rate override (<0 = cfg).')
    flags.DEFINE_string('resume', '', 'Checkpoint path to resume from.')
    flags.DEFINE_bool('warm_start_phase2', True,
                      'Carry shape-compatible phase-1 best params (trunk) '
                      'into the road phase, like the reference\'s '
                      'load_checkpoint("best") before finetuning.')
    flags.DEFINE_bool('tmp', True, 'Temporary storage.')
    flags.DEFINE_enum('encoder', 'sgnn', ['sgnn', 'mlp'],
                      'State-encoder trunk: sgnn (GCN message passing, the '
                      'paper model) or mlp (the reference\'s rl-mlp ablation, '
                      'reference state_encoder.py:217-308 / train.py:17-18).')
    FLAGS = flags.FLAGS

    def run(_):
        cfg = Config(FLAGS.cfg, FLAGS.global_seed, FLAGS.tmp)
        if FLAGS.normalize_advantages:
            cfg.agent_specs = dict(cfg.agent_specs,
                                   normalize_advantages=True)
        if FLAGS.tau >= 0.0:
            cfg.tau = FLAGS.tau
        if FLAGS.lr > 0.0:
            cfg.lr = FLAGS.lr
        run_training(cfg, FLAGS.iterations, FLAGS.num_envs or None,
                     FLAGS.separate_train, FLAGS.eval_envs,
                     FLAGS.tensorboard, FLAGS.rollout_len or None,
                     FLAGS.resume or None, FLAGS.warm_start_phase2,
                     num_devices=FLAGS.num_devices, encoder=FLAGS.encoder)

    flags.mark_flags_as_required(['cfg'])
    app.run(run)


if __name__ == '__main__':
    main()
