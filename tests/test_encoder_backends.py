"""Exact backend-parity tests for the GNN gather/scatter kernels.

The encoder's 'matmul' backend reads endpoint rows through dense one-hot
einsums on the MXU and aggregates through an incidence matmul; the
'scatter' backend is the classical take_along_axis / at[].add formulation
(the reference semantics, reference state_encoder.py:84-148). These tests
pin the two to each other:

  * gather: the one-hot contraction selects exactly one bf16-rounded row,
    so matmul-gather must equal take_along_axis(h.astype(bf16)) EXACTLY
    (not approximately) — each output element is one bf16 value widened
    to f32 by the accumulator.
  * scatter: matmul aggregation must match the scatter-add backend within
    bf16 rounding on bipartite graphs (no self-loops), batched and
    unbatched, with masked sentinel edges present.
  * self-loop convention: matmul counts a self-loop ONCE (max(oh0, oh1)),
    scatter counts it TWICE (reference convention) — the intentional
    divergence documented in _scatter_to_nodes_matmul's docstring. Pinned
    here so a silent convention change fails loudly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from urban_tpu.models import encoder as enc


def _rand_graph(rng, n_nodes, n_edges, d, n_valid=None, self_loop=False):
    h = rng.standard_normal((n_nodes, d)).astype(np.float32)
    e0 = rng.integers(0, n_nodes, size=n_edges)
    e1 = rng.integers(0, n_nodes, size=n_edges)
    if self_loop:
        e1 = e0.copy()
    else:
        # domain graphs are bipartite — no self-loops (where the matmul and
        # scatter conventions legitimately diverge; pinned separately)
        e1 = np.where(e1 == e0, (e0 + 1) % n_nodes, e1)
    edges = np.stack([e0, e1], axis=-1).astype(np.int32)
    mask = np.zeros(n_edges, bool)
    mask[: (n_valid if n_valid is not None else n_edges)] = True
    # sentinel padding: masked edges point both endpoints at the pad node
    edges[~mask] = n_nodes - 1
    return jnp.asarray(h), jnp.asarray(edges), jnp.asarray(mask)


@pytest.mark.parametrize('batched', [False, True])
@pytest.mark.parametrize('n_nodes,n_edges', [(40, 96), (37, 51), (320, 640)])
def test_gather_matmul_equals_take_along_axis_exactly(batched, n_nodes,
                                                      n_edges):
    rng = np.random.default_rng(0)
    h, edges, mask = _rand_graph(rng, n_nodes, n_edges, 16,
                                 n_valid=n_edges - 7)
    if batched:
        h, edges, mask = h[None].repeat(3, 0), edges[None].repeat(3, 0), \
            mask[None].repeat(3, 0)

    oh0, oh1 = enc.endpoint_one_hots(edges, n_nodes)
    h16 = h.astype(jnp.bfloat16)
    g0 = jnp.einsum('...en,...nd->...ed', oh0, h16,
                    preferred_element_type=jnp.float32)
    g1 = jnp.einsum('...en,...nd->...ed', oh1, h16,
                    preferred_element_type=jnp.float32)
    want0 = jnp.take_along_axis(h16, edges[..., 0:1], axis=-2).astype(
        jnp.float32)
    want1 = jnp.take_along_axis(h16, edges[..., 1:2], axis=-2).astype(
        jnp.float32)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(want0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(want1))


@pytest.mark.parametrize('batched', [False, True])
@pytest.mark.parametrize('n_nodes,n_edges', [(40, 96), (37, 51)])
def test_scatter_matmul_matches_scatter_backend(batched, n_nodes, n_edges,
                                                monkeypatch):
    rng = np.random.default_rng(1)
    h, edges, mask = _rand_graph(rng, n_nodes, n_edges, 16,
                                 n_valid=n_edges - 5)
    h_e = jnp.tanh(rng.standard_normal(
        ((3,) if batched else ()) + (n_edges, 16)).astype(np.float32))
    if batched:
        edges, mask = edges[None].repeat(3, 0), mask[None].repeat(3, 0)

    out_mm = enc._scatter_to_nodes_matmul(h_e, edges, mask, n_nodes)
    monkeypatch.setattr(enc, 'SCATTER_MODE', 'scatter')
    out_sc = enc.scatter_to_nodes(
        jnp.where(mask[..., None], h_e, 0.0), edges, mask, n_nodes)
    # bf16 rounding of both the operand and the appended count column
    np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_sc),
                               atol=0.03, rtol=0.02)


def test_masked_sentinel_rows_contribute_nothing():
    rng = np.random.default_rng(2)
    n_nodes, n_edges = 40, 64
    h, edges, mask = _rand_graph(rng, n_nodes, n_edges, 16, n_valid=20)
    h_e = jnp.tanh(jnp.asarray(
        rng.standard_normal((n_edges, 16)).astype(np.float32)))
    out = enc._scatter_to_nodes_matmul(h_e, edges, mask, n_nodes)
    # only valid edges touch the pad node; drop them by clearing the mask
    # entirely: the pad row must then be exactly zero
    out0 = enc._scatter_to_nodes_matmul(h_e, edges,
                                        jnp.zeros_like(mask), n_nodes)
    np.testing.assert_array_equal(np.asarray(out0), 0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_self_loop_convention_once_vs_twice(monkeypatch):
    """matmul counts self-loops once; the scatter backend (reference
    convention, state_encoder.py:146-148) counts them twice. Both yield the
    same MEAN for a node touched only by self-loops (sum and count double
    together), so the divergence is invisible in scatter_to_nodes output —
    pin it at the incidence level instead."""
    n_nodes, n_edges, d = 8, 4, 3
    edges = jnp.asarray([[2, 2], [5, 1], [5, 5], [0, 3]], jnp.int32)
    mask = jnp.ones(n_edges, bool)
    h_e = jnp.ones((n_edges, d), jnp.float32)

    oh0, oh1 = enc.endpoint_one_hots(edges, n_nodes)
    m_once = jnp.maximum(oh0, oh1)
    m_twice = oh0 + oh1
    deg_once = np.asarray(m_once.sum(0), np.float32)
    deg_twice = np.asarray(m_twice.sum(0), np.float32)
    assert deg_once[2] == 1 and deg_twice[2] == 2          # self-loop node
    assert deg_once[5] == 2 and deg_twice[5] == 3          # mixed node
    assert deg_once[0] == deg_twice[0] == 1                # plain node

    # node 5 has one self-loop + one real edge with DISTINCT values:
    # once-mean = (x1+x2)/2, twice-mean = (x1+2*x2)/3 — assert the actual
    # backends disagree there and agree everywhere else
    h_e = jnp.arange(n_edges, dtype=jnp.float32)[:, None] * h_e * 0.25
    out_mm = np.asarray(enc._scatter_to_nodes_matmul(
        h_e, edges, mask, n_nodes))
    monkeypatch.setattr(enc, 'SCATTER_MODE', 'scatter')
    out_sc = np.asarray(enc.scatter_to_nodes(
        h_e, edges, mask, n_nodes))
    np.testing.assert_allclose(out_mm[0], out_sc[0], atol=1e-2)
    np.testing.assert_allclose(out_mm[2], out_sc[2], atol=1e-2)
    assert not np.allclose(out_mm[5], out_sc[5], atol=1e-3)


def test_gather_to_edges_backend_parity(monkeypatch):
    """Full gather_to_edges (symmetrized edge MLP) agrees across backends
    within bf16 rounding of the endpoint reads."""
    import flax.linen as nn

    rng = np.random.default_rng(3)
    n_nodes, n_edges, d = 37, 51, 16
    h, edges, mask = _rand_graph(rng, n_nodes, n_edges, d, n_valid=44)

    class EdgeFC(nn.Module):
        @nn.compact
        def __call__(self, x):
            return jnp.tanh(nn.Dense(d)(x))

    fc = EdgeFC()
    params = fc.init(jax.random.PRNGKey(0), jnp.zeros((1, 2 * d)))

    def run():
        return enc.gather_to_edges(h, edges, mask,
                                   lambda x: fc.apply(params, x))

    monkeypatch.setattr(enc, 'SCATTER_MODE', 'matmul')
    out_mm = np.asarray(run())
    monkeypatch.setattr(enc, 'SCATTER_MODE', 'scatter')
    out_sc = np.asarray(run())
    np.testing.assert_allclose(out_mm, out_sc, atol=0.02, rtol=0.02)
