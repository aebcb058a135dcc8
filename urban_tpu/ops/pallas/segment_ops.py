"""Pallas TPU kernels for graph segment aggregation.

The SGNN encoder's hot op is scatter-mean of edge embeddings back to their
endpoint nodes (urban_tpu/models/encoder.py scatter_to_nodes; reference
scatter in torch at state_encoder.py:84-148).

Two implementations:

* ``segment_mean_onehot_pallas`` — the production-shaped kernel, validated
  ON-CHIP. One grid program per (batch, node-tile); the incidence one-hot
  for the tile is built in registers (broadcasted-iota compare against the
  endpoint index vectors) and contracted with the edge embeddings on the
  MXU. No dynamic indexing, no (E, N) one-hot roundtrip through HBM — the
  fusion XLA does for the encoder's matmul aggregation path, made explicit
  and guaranteed.

* ``segment_mean_pallas`` — the earlier per-edge accumulation kernel
  (VMEM accumulator, serial dynamic-slice updates). Interpreter-exact, but
  this environment's remote Mosaic compiler crashes (HTTP 500) on its
  dynamic-slice store loop, and a serial row walk is the anti-TPU
  formulation anyway; kept for documentation/differential testing only.

Masked-out edges are redirected to a dummy sink row rather than branched
on, so both kernels are branch-free. Numerical identity with the XLA
scatter path is asserted by tests/test_pallas_ops.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segment_mean_kernel(u_ref, v_ref, h_edges_ref, sum_ref, cnt_ref):
    """u_ref/v_ref: (1, 8, Ec) int32 endpoint indices (edge i = r*Ec + j);
    masked/padded edges point at the sink row (last row of the accumulators).
    One grid program per batch element; the row loop is static so no dynamic
    division appears in index arithmetic (Mosaic constraint)."""
    sum_ref[:] = jnp.zeros_like(sum_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)
    cols = u_ref.shape[2]

    for r in range(u_ref.shape[1]):
        def body(j, _):
            u = u_ref[0, r, j]
            v = v_ref[0, r, j]
            he = h_edges_ref[0, pl.ds(r * cols + j, 1), :]
            sum_ref[0, pl.ds(u, 1), :] += he
            sum_ref[0, pl.ds(v, 1), :] += he
            cnt_ref[0, pl.ds(u, 1), :] += 1.0
            cnt_ref[0, pl.ds(v, 1), :] += 1.0
            return 0

        jax.lax.fori_loop(0, cols, body, 0)


@functools.partial(jax.jit, static_argnames=('num_nodes', 'interpret'))
def segment_mean_pallas(h_edges: jnp.ndarray, edges: jnp.ndarray,
                        edge_mask: jnp.ndarray, num_nodes: int,
                        interpret: bool = False):
    """Scatter-mean edge embeddings to nodes.

    h_edges: (B, E, D), edges: (B, E, 2) int32, edge_mask: (B, E) bool.
    Returns (B, N, D) mean-aggregated node embeddings (EPS-guarded like the
    reference's scatter_count, state_encoder.py:84-108)."""
    B, E, D = h_edges.shape
    # pad the accumulator to a tile-aligned row count; the last row is the
    # sink for masked-out / padded edges
    n_rows = ((num_nodes + 1 + 7) // 8) * 8
    sink = n_rows - 1
    ed = jnp.where(edge_mask[..., None], edges, sink).astype(jnp.int32)
    # edge index layout (B, 8, Ec): satisfies the (8, full) block constraint
    Ep = ((E + 7) // 8) * 8
    ed = jnp.pad(ed, ((0, 0), (0, Ep - E), (0, 0)), constant_values=sink)
    h_pad = jnp.pad(h_edges, ((0, 0), (0, Ep - E), (0, 0)))
    # h_edges rows are visited as i = r*Ec + j, so order the index arrays
    # to match the (8, Ec) reshape of the edge axis
    u = ed[:, :, 0].reshape(B, 8, Ep // 8)
    v = ed[:, :, 1].reshape(B, 8, Ep // 8)

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 8, Ep // 8), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, Ep // 8), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, Ep, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, n_rows, D), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, n_rows, 1), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
    )

    s, c = pl.pallas_call(
        _segment_mean_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, n_rows, D), h_edges.dtype),
                   jax.ShapeDtypeStruct((B, n_rows, 1), h_edges.dtype)),
        interpret=interpret,
    )(u, v, h_pad)
    return (s / (c + 1e-6))[:, :num_nodes]


def _segment_mean_onehot_kernel(u_ref, v_ref, h_ref, sum_ref, cnt_ref,
                                *, node_tile: int):
    """Grid program (b, nt): aggregate all edges into node rows
    [nt*node_tile, (nt+1)*node_tile). The (E, TN) incidence one-hot lives
    only in registers; the contraction rides the MXU."""
    base = pl.program_id(1) * node_tile
    E = h_ref.shape[1]
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (E, node_tile), 1) + base
    u = u_ref[0, 0, :]
    v = v_ref[0, 0, :]
    oh = ((u[:, None] == node_ids).astype(jnp.float32)
          + (v[:, None] == node_ids).astype(jnp.float32))
    h = h_ref[0]
    sum_ref[0] = jax.lax.dot_general(
        oh, h, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    cnt_ref[0] = jnp.sum(oh, axis=0)[:, None]


@functools.partial(jax.jit,
                   static_argnames=('num_nodes', 'node_tile', 'interpret'))
def segment_mean_onehot_pallas(h_edges: jnp.ndarray, edges: jnp.ndarray,
                               edge_mask: jnp.ndarray, num_nodes: int,
                               node_tile: int = 128,
                               interpret: bool = False):
    """Scatter-mean edge embeddings to nodes, fused one-hot matmul kernel.

    h_edges: (B, E, D), edges: (B, E, 2) int32, edge_mask: (B, E) bool.
    Returns (B, N, D), numerically identical to segment_mean_xla."""
    B, E, D = h_edges.shape
    # sink index = num_nodes: lands in the padded tail, dropped on return
    n_rows = ((num_nodes + 1 + node_tile - 1) // node_tile) * node_tile
    sink = num_nodes
    ed = jnp.where(edge_mask[..., None], edges, sink).astype(jnp.int32)
    Ep = ((E + 7) // 8) * 8
    ed = jnp.pad(ed, ((0, 0), (0, Ep - E), (0, 0)), constant_values=sink)
    h_pad = jnp.pad(h_edges, ((0, 0), (0, Ep - E), (0, 0)))
    u = ed[:, :, 0].reshape(B, 1, Ep)
    v = ed[:, :, 1].reshape(B, 1, Ep)

    grid_spec = pl.GridSpec(
        grid=(B, n_rows // node_tile),
        in_specs=[pl.BlockSpec((1, 1, Ep), lambda b, nt: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, Ep), lambda b, nt: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, Ep, D), lambda b, nt: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, node_tile, D),
                                lambda b, nt: (b, nt, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, node_tile, 1),
                                lambda b, nt: (b, nt, 0),
                                memory_space=pltpu.VMEM)),
    )

    s, c = pl.pallas_call(
        functools.partial(_segment_mean_onehot_kernel, node_tile=node_tile),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, n_rows, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, n_rows, 1), jnp.float32)),
        interpret=interpret,
    )(u, v, h_pad)
    return (s / (c + 1e-6))[:, :num_nodes].astype(h_edges.dtype)


def segment_mean_xla(h_edges: jnp.ndarray, edges: jnp.ndarray,
                     edge_mask: jnp.ndarray, num_nodes: int):
    """XLA reference implementation (identical math, scatter-add based)."""
    d = h_edges.shape[-1]
    cnt_src = jnp.where(edge_mask[..., None], 1.0, 0.0)

    def one(h_e, ed, c_src):
        z = jnp.zeros((num_nodes, d), dtype=h_e.dtype)
        s = z.at[ed[:, 0]].add(h_e).at[ed[:, 1]].add(h_e)
        c = z.at[ed[:, 0]].add(c_src).at[ed[:, 1]].add(c_src)
        return s / (c + 1e-6)

    return jax.vmap(one)(h_edges, edges, cnt_src)
