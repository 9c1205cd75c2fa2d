"""Test env: force an 8-device virtual CPU platform BEFORE jax initializes.

Multi-chip sharding is validated on this virtual mesh (real multi-chip TPU
hardware isn't available in CI); numerics tests also run on CPU in float32
for determinism.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment force-injects the 'axon' TPU platform regardless of
# JAX_PLATFORMS, so pin the platform via config (must run before backend
# init). Tests run on an 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# XLA's DEFAULT matmul/conv precision is bf16-like even on CPU; tests compare
# against f32 oracles, so pin full f32 accumulation for determinism.
jax.config.update("jax_default_matmul_precision", "highest")

from uavdet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(211)
