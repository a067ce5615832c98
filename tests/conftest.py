"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes, so this executes at conftest
import time (pytest loads conftest before test modules import jax).
"""

import os

# Hard override: the interactive environment registers an 'axon' TPU-tunnel
# backend via sitecustomize and forces jax_platforms to "axon,cpu"; tests must
# run hermetically on the virtual 8-device CPU mesh. Setting the env var alone
# is not enough — the config must be updated after jax import, before any
# backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: this box has ONE cpu, and the suite
# compiles ~25 distinct ResNet50/YOLO-sized programs (30-90 s each, cold).
# With the cache, repeat runs finish in a few minutes.
_cache_dir = os.environ.get("POSE6D_JAX_CACHE", "/tmp/pose6d_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
