"""Masked categorical policy heads (reference:
urban_planning/models/policy.py:5-104).

Per-edge land-use head and per-node road head (stacked Dense+tanh ending in
width 1), masked with a large negative constant before the categorical. Unlike
the reference's boolean-index stage routing, both heads run for every batch
row and the stage one-hot selects which distribution contributes — branchless,
so one jitted function serves mixed-stage minibatches on TPU.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

MASK_PAD = -(2.0 ** 32 - 1)


class PolicyHead(nn.Module):
    """Stacked linear head -> per-element logit (reference policy.py:19-43)."""
    hidden_size: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.hidden_size):
            x = nn.Dense(f, use_bias=(i == 0))(x)
            if i < len(self.hidden_size) - 1:
                x = jnp.tanh(x)
        return x[..., 0]  # flatten trailing width-1


def masked_logits(logits, mask):
    return jnp.where(mask, logits, MASK_PAD)


def categorical_log_prob(logits, action):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -(p * jnp.where(p > 0, logp, 0.0)).sum(axis=-1)


class UrbanPlanningPolicy(nn.Module):
    """Policy network (reference policy.py:5-104)."""
    shared_net: nn.Module
    land_use_hidden: Sequence[int]
    road_hidden: Sequence[int]

    def setup(self):
        self.land_use_head = PolicyHead(self.land_use_hidden)
        self.road_head = PolicyHead(self.road_hidden)

    def _logits(self, obs):
        (state_lu, state_road, _, land_use_mask, road_mask, stage) = \
            self.shared_net(obs)
        lu_logits = masked_logits(self.land_use_head(state_lu), land_use_mask)
        road_logits = masked_logits(self.road_head(state_road), road_mask)
        return lu_logits, road_logits, stage

    def __call__(self, obs):
        return self._logits(obs)

    def select_action(self, obs, rng, mean_action: bool = False):
        """Sample (or argmax) an action pair (reference policy.py:67-85)."""
        lu_logits, road_logits, stage = self._logits(obs)
        rng_lu, rng_road = jax.random.split(rng)
        if mean_action:
            lu_action = jnp.argmax(lu_logits, axis=-1)
            road_action = jnp.argmax(road_logits, axis=-1)
        else:
            lu_action = jax.random.categorical(rng_lu, lu_logits, axis=-1)
            road_action = jax.random.categorical(rng_road, road_logits, axis=-1)
        in_land_use = stage[..., 0] > 0.5
        in_road = stage[..., 1] > 0.5
        action = jnp.stack([
            jnp.where(in_land_use, lu_action, 0),
            jnp.where(in_road, road_action, 0)], axis=-1)
        return action

    def get_log_prob_entropy(self, obs, action):
        """Stage-selected log-prob and entropy (reference policy.py:87-104)."""
        lu_logits, road_logits, stage = self._logits(obs)
        lu_lp = categorical_log_prob(lu_logits, action[..., 0])
        road_lp = categorical_log_prob(road_logits, action[..., 1])
        lu_ent = categorical_entropy(lu_logits)
        road_ent = categorical_entropy(road_logits)
        in_land_use = stage[..., 0] > 0.5
        in_road = stage[..., 1] > 0.5
        log_prob = jnp.where(in_land_use, lu_lp,
                             jnp.where(in_road, road_lp, 0.0))
        entropy = jnp.where(in_land_use, lu_ent,
                            jnp.where(in_road, road_ent, 0.0))
        return log_prob[..., None], entropy[..., None]
