"""State encoders (Flax): GNN trunk shared by policy and value heads.

TPU-native rebuild of the reference encoders (reference:
urban_planning/models/state_encoder.py:7-308):

  * SGNNStateEncoder — message-passing GCN over the padded plan graph:
    gather node embeddings to edges through a symmetrized edge MLP, scatter
    mean back to nodes with a residual connection, then single/multi-head
    attention of the current-land-use query over all nodes.
  * MLPStateEncoder — no message passing; edge features come from the
    feasible-side endpoint (ablation baseline).

Everything is fixed-shape and mask-based: batched observations are flat
arrays (no ragged lists), so the whole trunk jits and vmaps cleanly; the
scatter-mean lowers to an efficient TPU scatter.

Observation tuple layout (matches urban_tpu.envs.observation):
  numerical (B,F), nodes (B,N,D), edges (B,E,2) int32, current_node (B,D),
  node_mask (B,N) bool, edge_mask (B,E) bool, land_use_mask (B,E) bool,
  road_mask (B,N) bool, stage (B,3) float.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from urban_tpu import city_config

EPSILON = 1e-6


class MLP(nn.Module):
    features: Sequence[int]
    activate_final: bool = True

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = jnp.tanh(x)
        return x


def endpoint_one_hots(edges, num_nodes):
    """(..., E, N) bf16 one-hots of each edge's two endpoints.

    TPU row gathers serialize (~2 ms per 128x2304x16 take_along_axis in the
    rollout, profiled); endpoint reads as one-hot matmuls ride the MXU and
    XLA fuses the comparison into the operand. Built once per forward and
    shared by gather_to_edges / scatter_to_nodes."""
    n_ids = jnp.arange(num_nodes)
    oh0 = (edges[..., 0:1] == n_ids).astype(jnp.bfloat16)
    oh1 = (edges[..., 1:2] == n_ids).astype(jnp.bfloat16)
    return oh0, oh1


def gather_to_edges(h_nodes, edges, edge_mask, edge_fc, one_hots=None):
    """Per-edge embeddings from endpoint features through a symmetrized MLP
    (reference state_encoder.py:110-130)."""
    if SCATTER_MODE == 'matmul':
        if one_hots is None:
            one_hots = endpoint_one_hots(edges, h_nodes.shape[-2])
        oh0, oh1 = one_hots
        h16 = h_nodes.astype(jnp.bfloat16)
        h1 = jnp.einsum('...en,...nd->...ed', oh0, h16,
                        preferred_element_type=jnp.float32)
        h2 = jnp.einsum('...en,...nd->...ed', oh1, h16,
                        preferred_element_type=jnp.float32)
    else:
        h1 = jnp.take_along_axis(h_nodes, edges[..., 0:1], axis=-2)
        h2 = jnp.take_along_axis(h_nodes, edges[..., 1:2], axis=-2)
    h12 = jnp.concatenate([h1, h2], axis=-1)
    h21 = jnp.concatenate([h2, h1], axis=-1)
    h_edges = 0.5 * (edge_fc(h12) + edge_fc(h21))
    return jnp.where(edge_mask[..., None], h_edges, 0.0)


import os

# Edge->node aggregation backend: 'matmul' builds a dense incidence one-hot
# and aggregates on the MXU (forward AND backward are matmuls — TPU scatters
# serialize, and their transpose in the PPO backward is the training
# bottleneck); 'pallas' is the fused one-hot kernel
# (ops/pallas/segment_ops.py) that never materializes the (E, N) one-hot —
# measured on-chip: ~ties XLA 'matmul' at the encoder's production shape,
# 1.4x faster at large graphs (E=8k, N=4k); 'scatter' is the classical
# scatter-add (7x slower than either on TPU).
SCATTER_MODE = os.environ.get('URBAN_TPU_GNN_SCATTER', 'matmul')


def scatter_to_nodes(h_edges, edges, edge_mask, num_nodes, one_hots=None):
    """Mean-aggregate edge embeddings back to their endpoints
    (reference state_encoder.py:84-148)."""
    if SCATTER_MODE == 'matmul':
        return _scatter_to_nodes_matmul(h_edges, edges, edge_mask, num_nodes,
                                        one_hots)
    if SCATTER_MODE == 'pallas':
        from urban_tpu.ops.pallas.segment_ops import \
            segment_mean_onehot_pallas
        h = jnp.where(edge_mask[..., None], h_edges, 0.0)
        batched = h.ndim == 3
        if not batched:
            h, edges, edge_mask = (h[None], edges[None], edge_mask[None])
        out = segment_mean_onehot_pallas(h, edges.astype(jnp.int32),
                                         edge_mask, num_nodes)
        return out if batched else out[0]
    d = h_edges.shape[-1]
    counts_src = jnp.where(edge_mask[..., None], 1.0, 0.0)

    def scatter_one(h_e, idx, cnt):
        z = jnp.zeros((num_nodes, d), dtype=h_e.dtype)
        s = z.at[idx[:, 0]].add(h_e).at[idx[:, 1]].add(h_e)
        c = z.at[idx[:, 0]].add(cnt).at[idx[:, 1]].add(cnt)
        return s, c

    batched = h_edges.ndim == 3
    if batched:
        sums, counts = jax.vmap(scatter_one)(h_edges, edges, counts_src)
    else:
        sums, counts = scatter_one(h_edges, edges, counts_src)
    return sums / (counts + EPSILON)


def _scatter_to_nodes_matmul(h_edges, edges, edge_mask, num_nodes,
                             one_hots=None):
    """Aggregation as an incidence matmul: M[e, n] = 1 where n is an endpoint
    of edge e; sums = Mᵀ h_edges, counts = Mᵀ mask. Activations are O(1)
    tanh outputs, so bf16 matmul precision is ample.

    Self-loop convention: a self-loop edge (and masked sentinel padding,
    which points both endpoints at the pad node) contributes ONCE here
    (max(oh0, oh1) has a single 1), whereas the reference's scatter_add
    (reference state_encoder.py:146-148) — and this module's 'scatter'
    backend — would count it twice. Intentional divergence: domain graphs
    are bipartite (block x intersection), so no real self-loops exist
    (sentinel rows are zeroed by the edge mask either way)."""
    if one_hots is None:
        one_hots = endpoint_one_hots(edges, num_nodes)
    oh0, oh1 = one_hots
    em = edge_mask[..., None].astype(jnp.bfloat16)
    m16 = jnp.maximum(oh0, oh1) * em       # self-loop edges count once
    # degree counts ride the same matmul as an appended ones column (a
    # separate masked reduce over the (E, N) one-hot costs ~1.3 ms/step)
    ones = jnp.ones(h_edges.shape[:-1] + (1,), jnp.bfloat16)
    he = jnp.concatenate([h_edges.astype(jnp.bfloat16), ones], axis=-1)
    out = jnp.einsum('...en,...ed->...nd', m16, he,
                     preferred_element_type=jnp.float32)
    sums, counts = out[..., :-1], out[..., -1:]
    return sums / (counts + EPSILON)


def mean_features(h, mask):
    m = mask[..., None].astype(h.dtype)
    return (h * m).sum(axis=-2) / jnp.maximum(m.sum(axis=-2), EPSILON)


class MaskedAttention(nn.Module):
    """Multi-head attention of a single query over masked keys
    (reference state_encoder.py:150-161, nn.MultiheadAttention equivalent)."""
    dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, query, keys, values, mask):
        # query (...,1,D); keys/values (...,N,D); mask (...,N)
        h = self.num_heads
        dh = self.dim // h
        q = nn.Dense(self.dim)(query)
        k = nn.Dense(self.dim)(keys)
        v = nn.Dense(self.dim)(values)
        q = q.reshape(q.shape[:-1] + (h, dh))
        k = k.reshape(k.shape[:-1] + (h, dh))
        v = v.reshape(v.shape[:-1] + (h, dh))
        logits = jnp.einsum('...qhd,...nhd->...hqn', q, k) / jnp.sqrt(dh)
        logits = jnp.where(mask[..., None, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('...hqn,...nhd->...qhd', w, v)
        out = out.reshape(out.shape[:-2] + (self.dim,))
        return nn.Dense(self.dim)(out)


class SGNNStateEncoder(nn.Module):
    """GNN state encoder (reference state_encoder.py:7-214)."""
    hidden_size: Sequence[int]          # numerical-feature MLP widths
    gcn_node_dim: int
    num_gcn_layers: int
    num_edge_fc_layers: int
    num_attention_heads: int
    max_num_nodes: int
    max_num_edges: int

    @property
    def output_policy_land_use_size(self) -> int:
        return self.gcn_node_dim * 4

    @property
    def output_policy_road_size(self) -> int:
        return self.gcn_node_dim

    @property
    def output_value_size(self) -> int:
        return self.gcn_node_dim * 3 + self.hidden_size[-1] + 3

    @nn.compact
    def __call__(self, obs) -> Tuple:
        (numerical, nodes, edges, current_node, node_mask, edge_mask,
         land_use_mask, road_mask, stage) = obs
        h_numerical = MLP(self.hidden_size)(numerical)

        node_encoder = nn.Dense(self.gcn_node_dim, name='node_encoder')
        h_nodes = node_encoder(nodes)
        h_current = node_encoder(current_node)[..., None, :]  # (...,1,D)

        one_hots = (endpoint_one_hots(edges, self.max_num_nodes)
                    if SCATTER_MODE == 'matmul' else None)
        h_edges = jnp.zeros(h_nodes.shape[:-2]
                            + (self.max_num_edges, self.gcn_node_dim),
                            dtype=h_nodes.dtype)
        for layer in range(self.num_gcn_layers):
            edge_fc = MLP([self.gcn_node_dim] * self.num_edge_fc_layers,
                          name=f'edge_fc_{layer}')
            h_edges = gather_to_edges(h_nodes, edges, edge_mask, edge_fc,
                                      one_hots)
            h_nodes_new = scatter_to_nodes(h_edges, edges, edge_mask,
                                           self.max_num_nodes, one_hots)
            h_nodes = h_nodes + h_nodes_new

        h_edges_mean = mean_features(h_edges, edge_mask)
        h_nodes_mean = mean_features(h_nodes, node_mask)

        h_att = MaskedAttention(self.gcn_node_dim, self.num_attention_heads,
                                name='attention')(
            h_current, h_nodes, h_nodes, node_mask)[..., 0, :]

        state_value = jnp.concatenate(
            [h_numerical, h_nodes_mean, h_edges_mean, h_att, stage], axis=-1)

        h_cur_rep = jnp.broadcast_to(
            h_current, h_current.shape[:-2] + (self.max_num_edges,
                                               self.gcn_node_dim))
        state_policy_land_use = jnp.concatenate(
            [h_edges, h_cur_rep, h_edges * h_cur_rep, h_edges - h_cur_rep],
            axis=-1)
        state_policy_road = h_nodes

        return (state_policy_land_use, state_policy_road, state_value,
                land_use_mask, road_mask, stage)


class MLPStateEncoder(nn.Module):
    """Message-passing-free ablation encoder (reference
    state_encoder.py:217-308)."""
    hidden_size: Sequence[int]
    gcn_node_dim: int
    max_num_nodes: int
    max_num_edges: int

    @property
    def output_policy_land_use_size(self) -> int:
        return self.gcn_node_dim * 4

    @property
    def output_policy_road_size(self) -> int:
        return self.gcn_node_dim

    @property
    def output_value_size(self) -> int:
        return self.gcn_node_dim * 2 + self.hidden_size[-1] + 3

    @nn.compact
    def __call__(self, obs) -> Tuple:
        (numerical, nodes, edges, current_node, node_mask, edge_mask,
         land_use_mask, road_mask, stage) = obs
        h_numerical = MLP(self.hidden_size)(numerical)

        # raw edge features: the feasible-side endpoint's node features
        # (reference state_encoder.py:261-281)
        f1 = jnp.take_along_axis(nodes, edges[..., 0:1], axis=-2)
        f2 = jnp.take_along_axis(nodes, edges[..., 1:2], axis=-2)
        f2_is_feasible = (jnp.argmax(f2[..., :city_config.NUM_TYPES + 1],
                                     axis=-1) == city_config.FEASIBLE)
        edge_features = jnp.where(f2_is_feasible[..., None], f2, f1)
        edge_features = jnp.where(edge_mask[..., None], edge_features, 0.0)

        node_encoder = nn.Dense(self.gcn_node_dim, name='node_encoder')
        h_nodes = node_encoder(nodes)
        h_edges = node_encoder(edge_features)
        h_current = node_encoder(current_node)[..., None, :]

        h_edges_mean = mean_features(h_edges, edge_mask)
        h_nodes_mean = mean_features(h_nodes, node_mask)

        state_value = jnp.concatenate(
            [h_numerical, h_nodes_mean, h_edges_mean, stage], axis=-1)

        h_cur_rep = jnp.broadcast_to(
            h_current, h_current.shape[:-2] + (self.max_num_edges,
                                               self.gcn_node_dim))
        state_policy_land_use = jnp.concatenate(
            [h_edges, h_cur_rep, h_edges * h_cur_rep, h_edges - h_cur_rep],
            axis=-1)
        return (state_policy_land_use, h_nodes, state_value,
                land_use_mask, road_mask, stage)
