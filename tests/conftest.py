"""Test configuration: CPU backend with a virtual 8-device mesh + float64.

Tests run off-TPU so they are hermetic and so multi-chip sharding can be
validated without real chips (SURVEY.md §8): Pallas kernels run in interpret
mode, shardings run over 8 virtual CPU devices, and float64 is enabled so the
C-reference oracle (double precision, lib/matrix.h:4) can be matched tightly.
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register a TPU plugin that overrides JAX_PLATFORMS
# at import time; the config update below wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the U-Net train/sample graphs take minutes to
# compile on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/bla_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
