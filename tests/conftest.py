"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a host-platform device mesh
(xla_force_host_platform_device_count), matching how the driver dry-runs the
multi-chip path; real-TPU benchmarking happens in bench.py instead.

This environment pre-registers an 'axon' TPU backend at interpreter startup
(sitecustomize driven by PALLAS_AXON_POOL_IPS) and pins it via jax.config, so
plain JAX_PLATFORMS env overrides are ignored — the config entry itself must
be updated before any backend initializes.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: XLA compile time dominates the suite's
# wall clock (every test file jits the env/model programs). The on-disk
# cache works for the CPU backend too (verified: warm entries under
# ~/.cache/urban_tpu/jax), so the FIRST full run populates it and every
# later run — including the `-m "not slow"` commit gate — reuses the
# compiled programs. Opt out with URBAN_TPU_NO_COMPILE_CACHE=1.
from urban_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
