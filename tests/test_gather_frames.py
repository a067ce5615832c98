"""gather_frames: bit-exact with jnp.take on resident-frame buffers.

The device-resident trainer's batch gather (train/loop.expand_device_batch)
moved from jnp.take to the Pallas scalar-prefetch row gather after the
round-3 profile showed take costing ~300 ms/step on TPU (PERF.md). These
pin exact equality for every dtype/geometry the trainer ships, including
repeated and boundary indices, plus the odd-geometry fallback path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pose6d_tpu.ops.gather_frames import gather_frames


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((7, 48, 64, 3), np.uint8),    # RGB frames (48*64*3 = 9216 = 72 words*128)
        ((7, 48, 64), np.uint16),      # depth-mm   (48*64*2 bytes = 1536 words)
        ((5, 32, 128), np.uint32),     # pack=1 path
    ],
)
def test_matches_take_exactly(rng, shape, dtype):
    src = jnp.asarray(rng.integers(0, np.iinfo(dtype).max, shape, dtype))
    idx = jnp.asarray(np.array([0, 6 % shape[0], 3, 3, shape[0] - 1, 1],
                               np.int32))
    out = gather_frames(src, idx)
    ref = jnp.take(src, idx, axis=0)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_odd_geometry_falls_back(rng):
    # 5*5*3 = 75 bytes: not a whole number of uint32 words -> take path
    src = jnp.asarray(rng.integers(0, 255, (4, 5, 5, 3), np.uint8))
    idx = jnp.asarray(np.array([2, 0, 3], np.int32))
    np.testing.assert_array_equal(
        np.asarray(gather_frames(src, idx)),
        np.asarray(jnp.take(src, idx, axis=0)))


def test_full_permutation(rng):
    src = jnp.asarray(rng.integers(0, 255, (16, 8, 16, 4), np.uint8))
    idx = jnp.asarray(rng.permutation(16).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(gather_frames(src, idx)), np.asarray(src)[np.asarray(idx)])
