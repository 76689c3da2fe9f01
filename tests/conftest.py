"""Test harness: hermetic 8-device CPU mesh.

The axon sitecustomize registers the remote-TPU PJRT plugin in every
python process and forces platform selection, so JAX_PLATFORMS env alone
is NOT enough — jax.config must be updated before first backend use.
Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count); bench.py runs on the real chip.
Never run tests concurrently with a TPU process: the axon relay admits
one client at a time and the second blocks forever.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
