"""Test harness: force an 8-device virtual CPU mesh before jax import.

Multi-device sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), no real TPU slice needed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS at interpreter start; re-select CPU explicitly so tests run
# on the local 8-device virtual CPU mesh, not op-by-op over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# This jax build defaults matmuls/convs to bf16-like precision even on CPU;
# parity tests need real fp32.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by XLA compile time.
jax.config.update("jax_compilation_cache_dir", "/tmp/mm2d3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
