"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a host-platform device mesh
(xla_force_host_platform_device_count), matching how the driver dry-runs the
multi-chip path; real-TPU benchmarking happens in bench.py instead.

The environment pre-registers an 'axon' TPU backend through sitecustomize
(driven by PALLAS_AXON_POOL_IPS / JAX_PLATFORMS=axon), so both knobs must be
overridden, not defaulted.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
