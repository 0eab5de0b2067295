"""Test configuration: run everything on CPU with a virtual 8-device mesh.

Multi-chip sharding is validated the standard JAX way — no TPU pod needed:
``--xla_force_host_platform_device_count=8`` emulates a v5e-8 slice on host
CPU (SURVEY.md §4).  Must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config API
# (must happen before the backend initializes).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache (CPU executables DO serialize, unlike TPU ones):
# the suite's expensive compiles — sharded GAN steps, parity graphs — are
# reused across runs.  Tests lower the persistence threshold to 1 s (default
# 5 s) so the many tiny-shape step compiles also load from disk on warm runs.
os.environ.setdefault("WUT_CACHE_MIN_COMPILE_SECS", "1")
from weather_unet_tpu.core.profiling import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
