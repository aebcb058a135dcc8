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
