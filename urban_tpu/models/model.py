"""Model factory and shared-trunk actor-critic (reference:
urban_planning/models/model.py:8-47).

ActorCritic holds the shared state encoder plus both policy heads and the
value head in ONE parameter tree (single optimizer, like the reference's
ActorCritic wrapper), and exposes fused methods that run the trunk once per
call — on TPU the encoder dominates, so policy/value share its activations.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from urban_tpu.models.encoder import MLPStateEncoder, SGNNStateEncoder
from urban_tpu.models.policy import (PolicyHead, categorical_entropy,
                                     categorical_log_prob, masked_logits)


class ActorCritic(nn.Module):
    """Shared-trunk actor-critic."""
    encoder: str                       # 'sgnn' | 'mlp'
    hidden_size: Sequence[int]
    gcn_node_dim: int
    num_gcn_layers: int
    num_edge_fc_layers: int
    num_attention_heads: int
    max_num_nodes: int
    max_num_edges: int
    land_use_hidden: Sequence[int]
    road_hidden: Sequence[int]
    value_hidden: Sequence[int]

    def setup(self):
        if self.encoder == 'sgnn':
            self.shared_net = SGNNStateEncoder(
                hidden_size=self.hidden_size,
                gcn_node_dim=self.gcn_node_dim,
                num_gcn_layers=self.num_gcn_layers,
                num_edge_fc_layers=self.num_edge_fc_layers,
                num_attention_heads=self.num_attention_heads,
                max_num_nodes=self.max_num_nodes,
                max_num_edges=self.max_num_edges)
        elif self.encoder == 'mlp':
            self.shared_net = MLPStateEncoder(
                hidden_size=self.hidden_size,
                gcn_node_dim=self.gcn_node_dim,
                max_num_nodes=self.max_num_nodes,
                max_num_edges=self.max_num_edges)
        else:
            raise ValueError(f'Unknown encoder {self.encoder}')
        self.land_use_head = PolicyHead(self.land_use_hidden)
        self.road_head = PolicyHead(self.road_hidden)
        self.value_mlp = [nn.Dense(f) for f in self.value_hidden]

    def _trunk(self, obs):
        (state_lu, state_road, state_value, land_use_mask, road_mask,
         stage) = self.shared_net(obs)
        lu_logits = masked_logits(self.land_use_head(state_lu), land_use_mask)
        road_logits = masked_logits(self.road_head(state_road), road_mask)
        x = state_value
        for i, layer in enumerate(self.value_mlp):
            x = layer(x)
            if i < len(self.value_mlp) - 1:
                x = jnp.tanh(x)
        return lu_logits, road_logits, stage, x

    def __call__(self, obs):
        return self._trunk(obs)

    def value(self, obs):
        return self._trunk(obs)[3]

    def select_action(self, obs, rng, mean_action: bool = False):
        lu_logits, road_logits, stage, _ = self._trunk(obs)
        rng_lu, rng_road = jax.random.split(rng)
        if mean_action:
            lu_action = jnp.argmax(lu_logits, axis=-1)
            road_action = jnp.argmax(road_logits, axis=-1)
        else:
            lu_action = jax.random.categorical(rng_lu, lu_logits, axis=-1)
            road_action = jax.random.categorical(rng_road, road_logits, axis=-1)
        in_lu = stage[..., 0] > 0.5
        in_road = stage[..., 1] > 0.5
        return jnp.stack([jnp.where(in_lu, lu_action, 0),
                          jnp.where(in_road, road_action, 0)], axis=-1)

    def select_action_mixed(self, obs, rng, use_mean):
        """Per-row choice between sampling and argmax (noise-rate control,
        reference khrylib/rl/agents/agent.py:45-46)."""
        lu_logits, road_logits, stage, _ = self._trunk(obs)
        rng_lu, rng_road = jax.random.split(rng)
        lu_sample = jax.random.categorical(rng_lu, lu_logits, axis=-1)
        road_sample = jax.random.categorical(rng_road, road_logits, axis=-1)
        lu_action = jnp.where(use_mean, jnp.argmax(lu_logits, axis=-1), lu_sample)
        road_action = jnp.where(use_mean, jnp.argmax(road_logits, axis=-1),
                                road_sample)
        in_lu = stage[..., 0] > 0.5
        in_road = stage[..., 1] > 0.5
        return jnp.stack([jnp.where(in_lu, lu_action, 0),
                          jnp.where(in_road, road_action, 0)], axis=-1)

    def sample_action_logp_value(self, obs, rng, use_mean) -> Tuple:
        """One trunk pass for rollouts: sample the action and return its
        log-prob and the state value together (the reference needs separate
        policy/value passes; on TPU the fused pass halves rollout cost)."""
        lu_logits, road_logits, stage, value = self._trunk(obs)
        rng_lu, rng_road = jax.random.split(rng)
        lu_sample = jax.random.categorical(rng_lu, lu_logits, axis=-1)
        road_sample = jax.random.categorical(rng_road, road_logits, axis=-1)
        lu_action = jnp.where(use_mean, jnp.argmax(lu_logits, axis=-1),
                              lu_sample)
        road_action = jnp.where(use_mean, jnp.argmax(road_logits, axis=-1),
                                road_sample)
        in_lu = stage[..., 0] > 0.5
        in_road = stage[..., 1] > 0.5
        action = jnp.stack([jnp.where(in_lu, lu_action, 0),
                            jnp.where(in_road, road_action, 0)], axis=-1)
        lu_lp = categorical_log_prob(lu_logits, action[..., 0])
        road_lp = categorical_log_prob(road_logits, action[..., 1])
        log_prob = jnp.where(in_lu, lu_lp, jnp.where(in_road, road_lp, 0.0))
        return action, log_prob[..., None], value

    def log_prob_entropy_value(self, obs, action) -> Tuple:
        """One trunk pass serving the whole PPO loss."""
        lu_logits, road_logits, stage, value = self._trunk(obs)
        lu_lp = categorical_log_prob(lu_logits, action[..., 0])
        road_lp = categorical_log_prob(road_logits, action[..., 1])
        lu_ent = categorical_entropy(lu_logits)
        road_ent = categorical_entropy(road_logits)
        in_lu = stage[..., 0] > 0.5
        in_road = stage[..., 1] > 0.5
        log_prob = jnp.where(in_lu, lu_lp, jnp.where(in_road, road_lp, 0.0))
        entropy = jnp.where(in_lu, lu_ent, jnp.where(in_road, road_ent, 0.0))
        return log_prob[..., None], entropy[..., None], value


def create_model(cfg, encoder: str) -> ActorCritic:
    """Build the actor-critic from a Config (reference model.py:8-33)."""
    se = cfg.state_encoder_specs
    return ActorCritic(
        encoder=encoder,
        hidden_size=tuple(se['state_encoder_hidden_size']),
        gcn_node_dim=se['gcn_node_dim'],
        num_gcn_layers=se.get('num_gcn_layers', 2),
        num_edge_fc_layers=se.get('num_edge_fc_layers', 1),
        num_attention_heads=se.get('num_attention_heads', 1),
        max_num_nodes=se['max_num_nodes'],
        max_num_edges=se['max_num_edges'],
        land_use_hidden=tuple(cfg.policy_specs['policy_land_use_head_hidden_size']),
        road_hidden=tuple(cfg.policy_specs['policy_road_head_hidden_size']),
        value_hidden=tuple(cfg.value_specs['value_head_hidden_size']))


def create_sgnn_model(cfg) -> ActorCritic:
    return create_model(cfg, 'sgnn')


def create_mlp_model(cfg) -> ActorCritic:
    return create_model(cfg, 'mlp')


def dummy_obs(cfg, batch: int = 1):
    """A zero observation with the right shapes for init/compile checks."""
    se = cfg.state_encoder_specs
    n, e = se['max_num_nodes'], se['max_num_edges']
    node_dim = 23   # NUM_TYPES+1 one-hot + xy + area/len/w/h + rect/eqi/sc
    num_dim = 52    # 2 * (13 ratio + 13 count)
    f32 = jnp.float32
    return (jnp.zeros((batch, num_dim), f32),
            jnp.zeros((batch, n, node_dim), f32),
            jnp.zeros((batch, e, 2), jnp.int32),
            jnp.zeros((batch, node_dim), f32),
            jnp.zeros((batch, n), bool).at[:, 0].set(True),
            jnp.zeros((batch, e), bool).at[:, 0].set(True),
            jnp.zeros((batch, e), bool).at[:, 0].set(True),
            jnp.zeros((batch, n), bool).at[:, 0].set(True),
            jnp.zeros((batch, 3), f32).at[:, 0].set(1.0))
