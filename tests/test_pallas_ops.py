"""Differential test: pallas segment aggregation vs the XLA path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from urban_tpu.ops.pallas.segment_ops import (segment_mean_pallas,
                                              segment_mean_xla)


def test_segment_mean_matches_xla_interpret():
    B, E, N, D = 3, 64, 32, 16
    rng = np.random.default_rng(0)
    h_edges = jnp.asarray(rng.normal(size=(B, E, D)), dtype=jnp.float32)
    edges = jnp.asarray(rng.integers(0, N, size=(B, E, 2)), dtype=jnp.int32)
    mask = jnp.asarray(rng.random((B, E)) < 0.7)
    h_edges = jnp.where(mask[..., None], h_edges, 0.0)

    out_ref = segment_mean_xla(h_edges, edges, mask, N)
    out_pl = segment_mean_pallas(h_edges, edges, mask, N, interpret=True)
    assert np.asarray(out_pl) == pytest.approx(np.asarray(out_ref), abs=1e-5)


def test_segment_mean_onehot_matches_xla_interpret():
    """Fused one-hot kernel == scatter reference (interpreter mode; the
    same identity holds on-chip, measured max|diff| 1.2e-7 on TPU v5e)."""
    B, E, N, D = 2, 96, 40, 8
    rng = np.random.default_rng(3)
    h_edges = jnp.asarray(rng.normal(size=(B, E, D)), dtype=jnp.float32)
    # production graphs are bipartite (block, intersection): no self-loops
    e0 = rng.integers(0, N // 2, size=(B, E, 1))
    e1 = rng.integers(N // 2, N, size=(B, E, 1))
    edges = jnp.asarray(np.concatenate([e0, e1], axis=-1), dtype=jnp.int32)
    mask = jnp.asarray(rng.random((B, E)) < 0.7)
    h_edges = jnp.where(mask[..., None], h_edges, 0.0)

    from urban_tpu.ops.pallas.segment_ops import segment_mean_onehot_pallas
    out_ref = segment_mean_xla(h_edges, edges, mask, N)
    out_pl = segment_mean_onehot_pallas(h_edges, edges, mask, N,
                                        interpret=True)
    assert np.asarray(out_pl) == pytest.approx(np.asarray(out_ref),
                                               abs=1e-5)


def test_segment_mean_onehot_on_chip():
    """On-chip compile+run of the fused kernel (skips off-TPU)."""
    if jax.default_backend() not in ('tpu', 'axon'):
        pytest.skip('requires a TPU backend')
    from urban_tpu.ops.pallas.segment_ops import segment_mean_onehot_pallas
    B, E, N, D = 2, 64, 32, 16
    rng = np.random.default_rng(0)
    h_edges = jnp.asarray(rng.normal(size=(B, E, D)), dtype=jnp.float32)
    edges = jnp.asarray(rng.integers(0, N, size=(B, E, 2)), dtype=jnp.int32)
    mask = jnp.asarray(rng.random((B, E)) < 0.7)
    h_edges = jnp.where(mask[..., None], h_edges, 0.0)
    out_ref = segment_mean_xla(h_edges, edges, mask, N)
    out_pl = segment_mean_onehot_pallas(h_edges, edges, mask, N)
    assert np.asarray(out_pl) == pytest.approx(np.asarray(out_ref),
                                               abs=1e-5)


def test_encoder_pallas_backend_matches_matmul(monkeypatch):
    """Full SGNN forward with SCATTER_MODE=pallas (interpret on CPU) agrees
    with the production matmul backend. Domain graphs are bipartite
    (block, intersection), so the backends' self-loop conventions coincide;
    tolerance covers the matmul path's bf16 passes."""
    import numpy as np
    from urban_tpu.models import encoder as enc
    from urban_tpu.ops.pallas import segment_ops

    if jax.default_backend() == 'cpu':
        # route the kernel through the interpreter off-chip
        orig = segment_ops.segment_mean_onehot_pallas
        monkeypatch.setattr(
            segment_ops, 'segment_mean_onehot_pallas',
            lambda *a, **k: orig(*a, **{**k, 'interpret': True}))

    rng = np.random.default_rng(5)
    B, N, E, D = 2, 40, 64, 16
    h_edges = jnp.asarray(rng.normal(size=(B, E, D)), dtype=jnp.float32)
    e0 = rng.integers(0, N // 2, size=(B, E, 1))
    e1 = rng.integers(N // 2, N, size=(B, E, 1))
    edges = jnp.asarray(np.concatenate([e0, e1], -1), dtype=jnp.int32)
    mask = jnp.asarray(rng.random((B, E)) < 0.8)

    monkeypatch.setattr(enc, 'SCATTER_MODE', 'matmul')
    out_mm = enc.scatter_to_nodes(h_edges, edges, mask, N)
    monkeypatch.setattr(enc, 'SCATTER_MODE', 'pallas')
    out_pl = enc.scatter_to_nodes(h_edges, edges, mask, N)
    assert np.asarray(out_pl) == pytest.approx(np.asarray(out_mm), abs=2e-2)
