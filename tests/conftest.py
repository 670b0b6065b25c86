"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against 8 virtual CPU devices (SURVEY.md §4). NOTE: this environment's TPU
plugin overrides the JAX_PLATFORMS env var (config shows 'axon,cpu'), so the
platform must be forced through jax.config before first backend use.
"""
import pathlib
import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
