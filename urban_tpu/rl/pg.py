"""Vanilla policy-gradient (A2C) update.

Reference parity for AgentPG (reference: khrylib/rl/agents/agent_pg.py:7-55):
single-epoch advantage-weighted policy gradient + value MSE, the non-clipped
fallback the reference keeps below AgentPPO. Jitted like the PPO step."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from urban_tpu.rl.ppo import PPOConfig


def a2c_loss(model, params, obs, actions, returns, advantages, exps,
             cfg: PPOConfig):
    log_probs, entropy, values = model.apply(
        params, obs, actions, method='log_prob_entropy_value')
    value_loss = jnp.mean((values - returns) ** 2)
    w = exps.reshape(-1)
    wsum = jnp.maximum(w.sum(), 1.0)
    policy_loss = -((log_probs * advantages).reshape(-1) * w).sum() / wsum
    entropy_loss = -(entropy.reshape(-1) * w).sum() / wsum
    loss = policy_loss + cfg.value_pred_coef * value_loss \
        + cfg.entropy_coef * entropy_loss
    return loss, {'loss': loss, 'value_loss': value_loss,
                  'surr_loss': policy_loss, 'entropy_loss': entropy_loss}


@partial(jax.jit, static_argnames=('model', 'optimizer', 'cfg'))
def a2c_update_step(model, optimizer, cfg: PPOConfig, params, opt_state,
                    obs, actions, returns, advantages, exps):
    grad_fn = jax.value_and_grad(
        lambda p: a2c_loss(model, p, obs, actions, returns, advantages,
                           exps, cfg), has_aux=True)
    (_, stats), grads = grad_fn(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, stats
