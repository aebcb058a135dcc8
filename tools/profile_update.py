"""Ablation profiler for the PPO update phase (VERDICT round-2 weak #2:
update wall-clock dominates end-to-end training 3:1).

Times one full train_iteration, then isolates the update's components:
  - trajectory obs minibatch gather (the epoch scan's data movement)
  - loss forward+backward on one minibatch
  - optimizer apply
  - the full epoch scan
Optionally dumps a jax.profiler trace (--trace DIR) for op-level attribution.

Usage: python tools/profile_update.py [B] [--trace DIR]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3, label=''):
    try:
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])  # sync
    except Exception as e:
        print(f'{label:46s} FAILED: {type(e).__name__}: {str(e)[:120]}')
        return None
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    print(f'{label:46s} {best*1000:9.1f} ms')
    return best


def main():
    from urban_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from urban_tpu.utils.config import Config
    from urban_tpu.rl.train_tpu import TPUTrainer
    from urban_tpu.rl.ppo import ppo_update_epoch, ppo_loss
    from urban_tpu.jaxenv.rollout import (batched_gae,
                                          episode_success_weights)

    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 256
    trace_dir = None
    if '--trace' in sys.argv:
        trace_dir = sys.argv[sys.argv.index('--trace') + 1]

    cfg = Config('hlg', 0, tmp=True)
    trainer = TPUTrainer(cfg, num_envs=B, eval_envs=0)

    # full iteration (compile + warm)
    trainer.train_iteration(0, do_eval=False)
    t0 = time.time()
    trainer.train_iteration(1, do_eval=False)
    full_dt = time.time() - t0
    n_steps = B * trainer.rollout_len
    print(f'B={B} T={trainer.rollout_len}  full train_iteration: '
          f'{full_dt*1000:.0f} ms  ({n_steps/full_dt:.0f} env steps/s '
          f'end-to-end)')

    # phase split
    t0 = time.time()
    traj = trainer.collect()
    _ = np.asarray(traj.rewards)
    t_sample = time.time() - t0
    print(f'{"collect (sample)":46s} {t_sample*1000:9.1f} ms '
          f'({n_steps/t_sample:.0f} steps/s)')
    t0 = time.time()
    trainer.update(traj, 1)
    t_update = time.time() - t0
    print(f'{"update (GAE + 4 epochs)":46s} {t_update*1000:9.1f} ms')

    # --- update internals ---
    T, Bt = traj.rewards.shape
    n = T * Bt
    weights = episode_success_weights(traj.dones, traj.failures)
    advantages, returns = batched_gae(traj.rewards, traj.dones, traj.values,
                                      cfg.gamma, cfg.tau)
    flat_obs = tuple(o.reshape((n,) + o.shape[2:]) for o in traj.obs)
    actions = traj.actions.reshape(n, 2)
    returns = returns.reshape(n, 1)
    advantages = advantages.reshape(n, 1)
    fixed_lp = traj.log_probs.reshape(n, 1)
    valid = weights.reshape(n)
    exps = (traj.exps * weights).reshape(n)
    mb = min(cfg.mini_batch_size, n)
    num_mb = max(n // mb, 1)
    perm = jnp.asarray(np.random.default_rng(0).permutation(n))

    print('trajectory obs logical sizes:')
    for i, o in enumerate(traj.obs):
        print(f'  obs[{i}] {str(o.shape):28s} {o.dtype}  '
              f'{o.size * o.dtype.itemsize / 1e6:8.1f} MB')

    timeit(lambda: ppo_update_epoch(
        trainer.model, trainer.optimizer, trainer.ppo_cfg, trainer.params,
        trainer.opt_state, flat_obs, actions, returns, advantages, fixed_lp,
        exps, perm, num_mb, mb, valid), label='one epoch scan (15 mb)')

    # gather-only epoch: same scan, loss replaced by a cheap reduction
    from functools import partial

    @partial(jax.jit, static_argnames=('num_mb', 'mb_size'))
    def gather_epoch(obs, perm, num_mb: int, mb_size: int):
        idxs = perm[:num_mb * mb_size].reshape(num_mb, mb_size)

        def body(carry, idx):
            obs_b = tuple(o[idx] for o in obs)
            s = sum(jnp.sum(o) if o.dtype != jnp.bool_ else jnp.sum(o)
                    for o in obs_b)
            return carry + s.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return out
    timeit(lambda: gather_epoch(flat_obs, perm, num_mb, mb),
           label='epoch scan: obs gather only')

    # single minibatch loss fwd+bwd (jit'd standalone)
    idx0 = perm[:mb]
    obs_b = tuple(o[idx0] for o in flat_obs)
    obs_b = jax.tree.map(lambda x: np.asarray(x), obs_b)
    obs_b = tuple(jnp.asarray(x) for x in obs_b)
    args_b = (actions[idx0], returns[idx0], advantages[idx0], fixed_lp[idx0],
              exps[idx0], valid[idx0])
    args_b = tuple(jnp.asarray(np.asarray(x)) for x in args_b)

    @jax.jit
    def loss_fwdbwd(params, obs_b, a, r, adv, lp, e, v):
        grad_fn = jax.value_and_grad(
            lambda p: ppo_loss(trainer.model, p, obs_b, a, r, adv, lp, e,
                               trainer.ppo_cfg, v), has_aux=True)
        (_, stats), grads = grad_fn(params)
        return stats['loss'], grads
    timeit(lambda: loss_fwdbwd(trainer.params, obs_b, *args_b),
           label='one minibatch loss fwd+bwd')

    @jax.jit
    def loss_fwd(params, obs_b, a, r, adv, lp, e, v):
        return ppo_loss(trainer.model, params, obs_b, a, r, adv, lp, e,
                        trainer.ppo_cfg, v)[0]
    timeit(lambda: loss_fwd(trainer.params, obs_b, *args_b),
           label='one minibatch loss fwd only')

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            ppo_update_epoch(
                trainer.model, trainer.optimizer, trainer.ppo_cfg,
                trainer.params, trainer.opt_state, flat_obs, actions,
                returns, advantages, fixed_lp, exps, perm, num_mb, mb, valid)
            jax.block_until_ready                       # doc: see memory
            _ = np.asarray(trainer.params['params']
                           if isinstance(trainer.params, dict) else 0)
        print(f'trace written to {trace_dir}')


if __name__ == '__main__':
    main()
