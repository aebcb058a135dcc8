"""Device-mesh utilities for data-parallel training.

The reference scales sampling with 20 forked CPU workers and runs the PPO
update on one GPU (reference: khrylib/rl/agents/agent.py:75-100,
urban_planning/train.py:20). Here both halves are SPMD over a JAX mesh:
environments shard across devices on a 1-D ``dp`` axis (rollouts are
embarrassingly parallel), and the PPO update runs under ``shard_map`` with
``psum``'d gradients riding ICI — the TPU-native equivalent of gradient
all-reduce. Model parameters are replicated (the GNN is tiny; tensor/pipeline
parallelism would be pure overhead at this size, SURVEY.md §2.3).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = 'dp') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'requested a {n_devices}-device mesh but only '
                f'{len(devices)} devices are visible; force a virtual CPU '
                f'mesh with xla_force_host_platform_device_count (see '
                f'tests/conftest.py) or lower n_devices')
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = 'dp'):
    """Shard the leading (batch) axis of every leaf across the mesh."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_ppo_update(model, optimizer, ppo_cfg, mesh: Mesh,
                       axis: str = 'dp'):
    """Data-parallel PPO minibatch step.

    ppo_loss psums the weighted loss numerators and weight counts across
    the dp axis before dividing (axis_name), so per-row weighting equals
    the single-device global computation even when exploration-row counts
    differ across shards; the loss is then the global objective, and its
    full gradient is the psum of each shard's local-data gradient."""
    from urban_tpu.rl.ppo import ppo_loss
    from jax.experimental.shard_map import shard_map

    def local_step(params, opt_state, obs, actions, returns, advantages,
                   fixed_log_probs, exps, valid):
        grad_fn = jax.value_and_grad(
            lambda p: ppo_loss(model, p, obs, actions, returns, advantages,
                               fixed_log_probs, exps, ppo_cfg, valid,
                               axis_name=axis), has_aux=True)
        (_, stats), grads = grad_fn(params)
        grads = jax.lax.psum(grads, axis)
        stats = dict(stats, grad_norm=optax.global_norm(grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, stats

    obs_spec = tuple([P(axis)] * 9)
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), obs_spec, P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=False)
    return jax.jit(sharded)
