"""Clipped-PPO update, jitted end to end.

Reference semantics (khrylib/rl/agents/agent_ppo.py:6-60 and
urban_planning/agents/urban_planning_agent.py:281-371): clipped surrogate on
exploration steps only (``exps`` selects sampled actions; greedy steps still
contribute to the value loss), value MSE, entropy bonus, global-norm gradient
clipping, Adam.

TPU-native design: the loss runs on masked fixed-size minibatches (the
``exps`` filter becomes a weight, not boolean indexing), so one XLA program
serves every minibatch; the data-parallel variant wraps the same step in
shard_map with psum'd gradients (urban_tpu.parallel.mesh).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class PPOConfig(NamedTuple):
    clip_epsilon: float = 0.2
    value_pred_coef: float = 0.5
    entropy_coef: float = 0.01
    grad_clip: float = 1.0
    lr: float = 4e-4
    eps: float = 1e-5
    weight_decay: float = 0.0


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    tx = [optax.clip_by_global_norm(cfg.grad_clip)]
    if cfg.weight_decay > 0:
        tx.append(optax.adamw(cfg.lr, eps=cfg.eps,
                              weight_decay=cfg.weight_decay))
    else:
        tx.append(optax.adam(cfg.lr, eps=cfg.eps))
    return optax.chain(*tx)


def ppo_loss(model, params, obs, actions, returns, advantages,
             fixed_log_probs, exps, cfg: PPOConfig, valid=None,
             axis_name=None):
    """Masked PPO loss on a minibatch.

    exps weights the surrogate/entropy terms (reference applies them only to
    exploration rows, agent_ppo.py:48-55 / urban_planning_agent.py:363-371).
    valid weights the value loss: the reference never puts failed-episode or
    truncated-tail rows into memory at all (urban_planning_agent.py:75-86),
    so those rows must not train the value net either; pass the episode
    success weights (rollout.episode_success_weights). Defaults to all rows.

    With axis_name set (data-parallel shard_map), the weighted numerators
    and weight sums are psum'd across the axis BEFORE dividing, so per-row
    weighting matches the single-device global computation exactly (a
    mean-of-per-shard-means would skew rows on shards with fewer
    exploration rows)."""
    log_probs, entropy, values = model.apply(
        params, obs, actions, method='log_prob_entropy_value')

    w = exps.reshape(-1)
    v_w = jnp.ones_like(w) if valid is None else valid.reshape(-1)
    ratio = jnp.exp(log_probs - fixed_log_probs)
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1.0 - cfg.clip_epsilon,
                     1.0 + cfg.clip_epsilon) * advantages

    val_num = (v_w * ((values - returns) ** 2).reshape(-1)).sum()
    surr_num = -(jnp.minimum(surr1, surr2).reshape(-1) * w).sum()
    ent_num = -(entropy.reshape(-1) * w).sum()
    wsum = w.sum()
    vsum = v_w.sum()
    if axis_name is not None:
        # psum only the (param-independent) weight counts: the local loss is
        # then this shard's exact contribution to the global weighted mean,
        # so psum'ing the resulting gradients reproduces the single-device
        # global gradient. (psum'ing the numerators instead would double
        # count through psum's transpose: each shard's grad would already
        # carry an n_shards factor.)
        wsum, vsum = jax.lax.psum((wsum, vsum), axis_name)
    value_loss = val_num / jnp.maximum(vsum, 1.0)
    surr_loss = surr_num / jnp.maximum(wsum, 1.0)
    entropy_loss = ent_num / jnp.maximum(wsum, 1.0)

    loss = surr_loss + cfg.value_pred_coef * value_loss \
        + cfg.entropy_coef * entropy_loss
    stats = {'loss': loss, 'value_loss': value_loss, 'surr_loss': surr_loss,
             'entropy_loss': entropy_loss}
    if axis_name is not None:
        # report the global loss decomposition
        stats = jax.lax.psum(jax.lax.stop_gradient(stats), axis_name)
    return loss, stats


@partial(jax.jit, static_argnames=('model', 'optimizer', 'cfg'))
def ppo_update_step(model, optimizer, cfg: PPOConfig, params, opt_state,
                    obs, actions, returns, advantages, fixed_log_probs, exps,
                    valid=None):
    """One minibatch gradient step."""
    grad_fn = jax.value_and_grad(
        lambda p: ppo_loss(model, p, obs, actions, returns, advantages,
                           fixed_log_probs, exps, cfg, valid), has_aux=True)
    (_, stats), grads = grad_fn(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, stats


@partial(jax.jit, static_argnames=('model',))
def fixed_log_probs_and_values(model, params, obs, actions):
    """Pre-update log-probs (frozen policy) and values in one trunk pass
    (reference does two chunked passes, urban_planning_agent.py:256-292)."""
    log_probs, _, values = model.apply(params, obs, actions,
                                       method='log_prob_entropy_value')
    return log_probs, values


@partial(jax.jit, static_argnames=('model', 'optimizer', 'cfg', 'num_mb',
                                   'mb_size'))
def ppo_update_epoch(model, optimizer, cfg: PPOConfig, params, opt_state,
                     obs, actions, returns, advantages, fixed_log_probs,
                     exps, perm, num_mb: int, mb_size: int, valid=None):
    """One full shuffled epoch of minibatch updates as a single XLA program.

    The per-minibatch host dispatch costs ~27 ms on this backend; scanning
    over minibatches inside one jit amortizes it to one call per epoch."""
    idxs = perm[:num_mb * mb_size].reshape(num_mb, mb_size)
    if valid is None:
        valid = jnp.ones_like(exps)

    def body(carry, idx):
        params, opt_state = carry
        obs_b = tuple(o[idx] for o in obs)
        grad_fn = jax.value_and_grad(
            lambda p: ppo_loss(model, p, obs_b, actions[idx], returns[idx],
                               advantages[idx], fixed_log_probs[idx],
                               exps[idx], cfg, valid[idx]), has_aux=True)
        (_, stats), grads = grad_fn(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), stats

    (params, opt_state), stats = jax.lax.scan(body, (params, opt_state),
                                              idxs)
    mean_stats = jax.tree.map(lambda x: x.mean(), stats)
    return params, opt_state, mean_stats
