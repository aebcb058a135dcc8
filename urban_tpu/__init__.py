"""urban_tpu: TPU-native urban-community spatial planning framework.

See README.md for the architecture overview and COMPONENTS.md for the
line-by-line mapping to the reference implementation's component inventory.
"""

__version__ = '0.1.0'
