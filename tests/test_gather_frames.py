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


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((7, 48, 64, 3), np.uint8),
        ((7, 48, 64), np.uint16),
    ],
)
def test_host_packed_roundtrip(rng, shape, dtype):
    """pack_frames_host + gather_frames_packed == take on the raw array.

    This is the trainer's production path: the in-graph bitcast of the full
    resident buffer OOMs at parity scale (a hoisted 4x u32 copy), so the
    pack happens host-side and only batch-sized outputs are ever bitcast."""
    from pose6d_tpu.ops.gather_frames import (
        gather_frames_packed,
        pack_frames_host,
    )

    src_np = rng.integers(0, np.iinfo(dtype).max, shape, dtype)
    words = pack_frames_host(src_np)
    assert words is not None and words.dtype == np.uint32
    # the view shares memory with the source — a true zero-copy pack
    assert words.base is not None
    idx = np.array([0, 3, 3, shape[0] - 1, 1], np.int32)
    out = gather_frames_packed(
        jnp.asarray(words), jnp.asarray(idx), shape[1:], dtype)
    assert out.dtype == dtype and out.shape == (len(idx),) + shape[1:]
    np.testing.assert_array_equal(np.asarray(out), src_np[idx])


def test_pack_frames_host_odd_geometry():
    # 5*5*3 = 75 bytes: no whole word rows -> caller falls back to raw+take
    from pose6d_tpu.ops.gather_frames import pack_frames_host

    assert pack_frames_host(np.zeros((4, 5, 5, 3), np.uint8)) is None
