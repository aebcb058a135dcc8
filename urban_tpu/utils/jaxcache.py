"""Persistent XLA compilation cache for the CLI entry points.

The jitted environment + model programs take minutes to compile on the TPU
backend (the whole rollout scan is one XLA program); every fresh process
pays that again because JAX's compilation cache is in-memory by default.
Enabling the persistent on-disk cache makes the second and later runs of
train/eval/bench start in seconds (measured on the attached TPU backend:
2.4 s -> 0.47 s for a toy program; ~14 min -> ~1 min for the full HLG
trainer).

The reference has no equivalent concern — its env is interpreted Python —
so this is framework infrastructure, not a ported component.

Opt out with URBAN_TPU_NO_COMPILE_CACHE=1 (e.g. when benchmarking cold
compile times); override the location with URBAN_TPU_COMPILE_CACHE_DIR.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser('~/.cache/urban_tpu/jax')


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Safe to call more than
    once; returns the cache dir, or None when disabled by env.

    Also re-applies the JAX_PLATFORMS env var through jax.config: TPU
    plugins that register at interpreter startup (this box's axon
    sitecustomize) pin the platform via jax.config, which silently
    overrides the env var — so ``JAX_PLATFORMS=cpu python -m
    urban_tpu...`` would still dial the TPU. Every CLI main calls this
    before touching a backend, restoring the documented env-var
    behavior."""
    platforms = os.environ.get('JAX_PLATFORMS')
    if platforms:
        import jax
        try:
            jax.config.update('jax_platforms', platforms)
        except Exception:
            pass    # backend already initialized; keep whatever it picked
    if os.environ.get('URBAN_TPU_NO_COMPILE_CACHE'):
        return None
    cache_dir = (cache_dir
                 or os.environ.get('URBAN_TPU_COMPILE_CACHE_DIR')
                 or DEFAULT_DIR)
    # Partition by platform + XLA_FLAGS: the cache key does not cover every
    # codegen-relevant compile option, and loading an entry compiled under a
    # different flag set (e.g. the test suite's 8-device host topology) both
    # warns about machine-feature mismatches AND can change borderline f32
    # results between processes — observed as non-reproducible lockstep
    # divergence metrics. One subdirectory per configuration keeps every
    # process deterministic and reproducible.
    import hashlib
    import jax
    # jax.config is the authoritative platform selection on this box (the
    # axon plugin ignores the env var), so key on the config value, falling
    # back to the env var when no explicit selection was made.
    platform_sel = (getattr(jax.config, 'jax_platforms', None)
                    or os.environ.get('JAX_PLATFORMS', ''))
    tag = hashlib.sha1(
        (os.environ.get('XLA_FLAGS', '') + '|'
         + str(platform_sel)).encode()).hexdigest()[:8]
    cache_dir = os.path.join(cache_dir, tag)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
    return cache_dir
