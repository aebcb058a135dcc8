"""Parameter and schedule utilities.

JAX equivalents of the reference's torch helpers (reference:
khrylib/utils/torch.py:83-217): flat parameter/gradient views and learning
rate schedules. Device/mode context managers have no JAX analogue — arrays
are placed by shardings and modules are stateless."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def get_flat_params(params) -> jnp.ndarray:
    """Flatten a parameter pytree into one vector
    (khrylib/utils/torch.py:87-93)."""
    flat, _ = jax.flatten_util.ravel_pytree(params)
    return flat


def set_flat_params(params, flat: jnp.ndarray):
    """Rebuild a parameter pytree from a flat vector
    (khrylib/utils/torch.py:96-104)."""
    _, unravel = jax.flatten_util.ravel_pytree(params)
    return unravel(flat)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def lr_schedule(kind: str, base_lr: float, total_steps: int,
                warmup_steps: int = 0, end_lr: float = 0.0):
    """Learning-rate schedules (khrylib/utils/torch.py:150-217 equivalents)
    as optax schedules: 'constant', 'linear', 'cosine', 'step'."""
    if kind == 'constant':
        return optax.constant_schedule(base_lr)
    if kind == 'linear':
        return optax.linear_schedule(base_lr, end_lr,
                                     max(total_steps - warmup_steps, 1),
                                     warmup_steps)
    if kind == 'cosine':
        return optax.warmup_cosine_decay_schedule(
            0.0 if warmup_steps else base_lr, base_lr, warmup_steps,
            total_steps, end_lr)
    if kind == 'step':
        return optax.exponential_decay(base_lr, max(total_steps // 3, 1),
                                       0.1, staircase=True)
    raise ValueError(f'Unknown schedule {kind}')
