"""Compact (uint8/uint16) host->device batch path is bit-exact vs float32.

The loader's compact_arrays mode quarters H2D bytes; decompress_batch and
the augment entry points must reproduce the float path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pose6d_tpu.data.pipeline import LineMODPoseLoader
from pose6d_tpu.data.synthetic import generate_synthetic_linemod
from pose6d_tpu.ops.augment import AugmentConfig, eval_preprocess, train_augment
from pose6d_tpu.train.loop import decompress_batch

import pytest


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("linemod_compact")
    return generate_synthetic_linemod(str(root), obj_ids=(1,), frames_per_obj=10, seed=5)


def test_train_augment_uint8_matches_float():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    cfg = AugmentConfig()
    key = jax.random.key(7)
    a = train_augment(key, jnp.asarray(u8), cfg)
    b = train_augment(key, jnp.asarray(f32), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(eval_preprocess(jnp.asarray(u8))),
        np.asarray(eval_preprocess(jnp.asarray(f32))),
    )


def test_compact_loader_bit_exact(synth):
    kw = dict(mode="val", flavor="rgbd", img_size=64, num_workers=0)
    lf = LineMODPoseLoader(synth["data"], **kw)
    lc = LineMODPoseLoader(synth["data"], compact_arrays=True, **kw)
    rng = np.random.default_rng(1)
    bf = next(lf.batches(2, rng, shuffle=False, drop_remainder=False))
    rng = np.random.default_rng(1)
    bc = next(lc.batches(2, rng, shuffle=False, drop_remainder=False))

    assert bc["rgb"].dtype == np.uint8 and bc["depth_mm"].dtype == np.uint16
    dec = {k: np.asarray(v) for k, v in decompress_batch(
        {k: jnp.asarray(v) for k, v in bc.items()}).items()}
    np.testing.assert_array_equal(dec["rgb"].astype(np.float32) / 255.0, bf["rgb"])
    np.testing.assert_array_equal(dec["depth_raw"], bf["depth_raw"])
    np.testing.assert_array_equal(dec["depth"], bf["depth"])
    for k in ("quat", "trans", "obj_id", "cam_K", "cam_K_crop"):
        np.testing.assert_array_equal(dec[k], bf[k])
