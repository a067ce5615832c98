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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
