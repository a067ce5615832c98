"""Device crop+resize vs the cv2 host golden path."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.data.crop import compute_crop_params, crop_resize_image
from pose6d_tpu.ops.crop_resize import crop_params_from_bbox, crop_resize_bilinear


@pytest.fixture
def image(rng):
    return rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)


def test_matches_cv2_interior_crop(image):
    # crop fully inside the image: device path must match cv2 bilinear closely
    bbox = np.array([40.0, 30.0, 50.0, 40.0])
    p = compute_crop_params(bbox, bbox, 160, 120, 64)
    host = crop_resize_image(image, p).astype(np.float32)

    x1, y1, size = crop_params_from_bbox(jnp.asarray(bbox)[None])
    assert float(x1[0]) == p.x1 and float(y1[0]) == p.y1 and float(size[0]) == p.size
    dev = np.asarray(
        crop_resize_bilinear(jnp.asarray(image)[None], x1, y1, size, 64)
    )[0]
    # cv2 uses fixed-point arithmetic; allow ~1 intensity level
    assert np.abs(dev - host).max() <= 1.5
    assert np.abs(dev - host).mean() < 0.3


def test_matches_cv2_with_padding(image):
    # crop hanging off the top-left corner: zero padding semantics
    bbox = np.array([-20.0, -10.0, 60.0, 50.0])
    p = compute_crop_params(bbox, bbox, 160, 120, 64)
    host = crop_resize_image(image, p).astype(np.float32)

    # device path works in the original frame: x1 pre-padding
    x1o = p.x1 - p.pad_l
    y1o = p.y1 - p.pad_t
    dev = np.asarray(
        crop_resize_bilinear(
            jnp.asarray(image)[None],
            jnp.asarray([float(x1o)]),
            jnp.asarray([float(y1o)]),
            jnp.asarray([float(p.size)]),
            64,
        )
    )[0]
    assert np.abs(dev - host).max() <= 1.5


def test_batched_different_crops(image):
    imgs = jnp.asarray(np.stack([image, image[::-1].copy()]))
    x1 = jnp.asarray([10.0, 50.0])
    y1 = jnp.asarray([5.0, 20.0])
    size = jnp.asarray([60.0, 80.0])
    out = crop_resize_bilinear(imgs, x1, y1, size, 32)
    assert out.shape == (2, 32, 32, 3)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_identity_crop_is_resize(image):
    # crop of the exact full image == plain cv2 resize
    dev = np.asarray(
        crop_resize_bilinear(
            jnp.asarray(image)[None],
            jnp.asarray([0.0]),
            jnp.asarray([0.0]),
            jnp.asarray([160.0]),
            80,
        )
    )[0]
    # note: cv2.resize of non-square to square scales axes independently;
    # our square crop uses one size for both, so compare against a 160x160
    # zero-padded frame resized to 80
    padded = np.zeros((160, 160, 3), np.uint8)
    padded[:120] = image
    host = cv2.resize(padded, (80, 80), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    assert np.abs(dev - host).max() <= 1.5
