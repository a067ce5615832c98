"""Fast-path ops: matmul crop+resize vs gather path; pallas ADD-S kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.losses.add import _pairwise_min_dist
from pose6d_tpu.ops.crop_resize import crop_resize_bilinear, crop_resize_matmul
from pose6d_tpu.ops.pallas_addmin import pairwise_min_dist_pallas


@pytest.fixture
def imgs(rng):
    return jnp.asarray(rng.integers(0, 255, size=(3, 120, 160, 3)).astype(np.float32))


def test_matmul_matches_gather_interior(imgs):
    x1 = jnp.asarray([10.0, 40.0, 25.0])
    y1 = jnp.asarray([5.0, 30.0, 15.0])
    size = jnp.asarray([60.0, 72.0, 90.0])
    a = np.asarray(crop_resize_bilinear(imgs, x1, y1, size, 64))
    b = np.asarray(crop_resize_matmul(imgs, x1, y1, size, 64))
    np.testing.assert_allclose(b, a, atol=1e-2)


def test_matmul_matches_gather_with_oob(imgs):
    # crops hanging off every border: zero-padding + edge-replication parity
    x1 = jnp.asarray([-20.0, 120.0, -10.0])
    y1 = jnp.asarray([-15.0, 80.0, 100.0])
    size = jnp.asarray([80.0, 100.0, 50.0])
    a = np.asarray(crop_resize_bilinear(imgs, x1, y1, size, 48))
    b = np.asarray(crop_resize_matmul(imgs, x1, y1, size, 48))
    np.testing.assert_allclose(b, a, atol=1e-2)


def test_matmul_crop_jit_grad(imgs):
    # differentiable w.r.t. the image (needed if preprocessing joins training)
    x1 = jnp.asarray([10.0, 20.0, 30.0])
    y1 = jnp.asarray([10.0, 20.0, 30.0])
    size = jnp.asarray([50.0, 50.0, 50.0])
    f = jax.jit(lambda im: jnp.sum(crop_resize_matmul(im, x1, y1, size, 32)))
    g = jax.grad(f)(imgs)
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_addmin_matches_jnp(rng):
    B, P = 4, 500
    pred = jnp.asarray(rng.normal(scale=0.05, size=(B, P, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(scale=0.05, size=(B, P, 3)).astype(np.float32))
    ref = np.asarray(_pairwise_min_dist(pred, gt))
    ours = np.asarray(pairwise_min_dist_pallas(pred, gt))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_addmin_identical_points(rng):
    B, P = 2, 500
    pts = jnp.asarray(rng.normal(scale=0.05, size=(B, P, 3)).astype(np.float32))
    out = np.asarray(pairwise_min_dist_pallas(pts, pts))
    np.testing.assert_allclose(out, 0.0, atol=1e-4)


def test_pallas_addmin_padding_neutral(rng):
    # P not a multiple of 128: padded GT sentinels must not affect the min
    B, P = 2, 130
    pred = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    ref = np.asarray(_pairwise_min_dist(pred, gt))
    ours = np.asarray(pairwise_min_dist_pallas(pred, gt))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_windowed_crop_matches_full(rng):
    from pose6d_tpu.ops.crop_resize import crop_resize_matmul_windowed

    imgs = jnp.asarray(rng.integers(0, 255, size=(3, 120, 160, 3)).astype(np.float32))
    x1 = jnp.asarray([10.0, 100.0, -15.0])   # interior, right edge, off-left
    y1 = jnp.asarray([5.0, 60.0, -10.0])
    size = jnp.asarray([60.0, 58.0, 50.0])
    full = np.asarray(crop_resize_bilinear(imgs, x1, y1, size, 48))
    win = np.asarray(crop_resize_matmul_windowed(imgs, x1, y1, size, 48, window=64))
    np.testing.assert_allclose(win, full, atol=1e-2)
