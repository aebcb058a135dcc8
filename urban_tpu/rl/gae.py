"""Generalized Advantage Estimation.

Reference semantics (khrylib/rl/core/common.py:5-26): a reverse scan over a
flat step sequence where ``mask=0`` marks episode ends, computing
  delta_t = r_t + gamma * V_{t+1} * mask_t - V_t
  A_t     = delta_t + gamma * tau * A_{t+1} * mask_t
  returns = V + A

Provided as a jitted ``lax.scan`` (TPU path) and a numpy fallback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('normalize',))
def estimate_advantages(rewards: jnp.ndarray, masks: jnp.ndarray,
                        values: jnp.ndarray, gamma: float, tau: float,
                        normalize: bool = False):
    """rewards/masks/values: (T,) or (T,1). Returns (advantages, returns)."""
    r = rewards.reshape(-1)
    m = masks.reshape(-1)
    v = values.reshape(-1)

    def body(carry, x):
        prev_value, prev_adv = carry
        r_t, m_t, v_t = x
        delta = r_t + gamma * prev_value * m_t - v_t
        adv = delta + gamma * tau * prev_adv * m_t
        return (v_t, adv), adv

    (_, _), adv_rev = jax.lax.scan(body, (0.0, 0.0), (r[::-1], m[::-1], v[::-1]))
    advantages = adv_rev[::-1]
    returns = v + advantages
    if normalize:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    shape = rewards.shape
    return advantages.reshape(shape), returns.reshape(shape)


def estimate_advantages_np(rewards, masks, values, gamma, tau,
                           normalize=False):
    r = np.asarray(rewards, dtype=np.float64).reshape(-1)
    m = np.asarray(masks, dtype=np.float64).reshape(-1)
    v = np.asarray(values, dtype=np.float64).reshape(-1)
    adv = np.zeros_like(r)
    prev_value = 0.0
    prev_adv = 0.0
    for i in range(len(r) - 1, -1, -1):
        delta = r[i] + gamma * prev_value * m[i] - v[i]
        adv[i] = delta + gamma * tau * prev_adv * m[i]
        prev_value = v[i]
        prev_adv = adv[i]
    returns = v + adv
    if normalize:
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    return (adv.reshape(np.shape(rewards)).astype(np.float32),
            returns.reshape(np.shape(rewards)).astype(np.float32))
