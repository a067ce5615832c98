"""On-device augmentation: semantics vs torchvision-style expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.ops.augment import (
    AugmentConfig,
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    color_jitter,
    eval_preprocess,
    normalize,
    random_erasing,
    random_grayscale,
    rgb_to_grayscale,
    train_augment,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32))


def test_identity_factors(img):
    one = jnp.float32(1.0)
    np.testing.assert_allclose(np.asarray(adjust_brightness(img, one)), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(adjust_contrast(img, one)), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(adjust_saturation(img, one)), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(adjust_hue(img, jnp.float32(0.0))), np.asarray(img), atol=1e-5)


def test_brightness_scales(img):
    out = adjust_brightness(img, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 0.5, atol=1e-6)


def test_grayscale_weights():
    img = jnp.ones((4, 4, 3)) * jnp.asarray([1.0, 0.0, 0.0])
    g = rgb_to_grayscale(img)
    np.testing.assert_allclose(np.asarray(g), 0.299, atol=1e-6)


def test_hue_full_cycle(img):
    # hue shift by exactly 1.0 is identity (mod 1)
    out = adjust_hue(img, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_hue_shift_rotates_channels():
    # pure red shifted by 1/3 becomes pure green
    red = jnp.zeros((2, 2, 3)).at[..., 0].set(1.0)
    out = np.asarray(adjust_hue(red, jnp.float32(1.0 / 3.0)))
    np.testing.assert_allclose(out[..., 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-5)


def test_normalize_imagenet(img):
    out = np.asarray(normalize(img))
    ref = (np.asarray(img) - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_random_grayscale_prob():
    img = jnp.ones((8, 8, 3)) * jnp.asarray([1.0, 0.5, 0.0])
    taken = 0
    for i in range(200):
        out = random_grayscale(jax.random.key(i), img, 0.1)
        if np.allclose(np.asarray(out[..., 0]), np.asarray(out[..., 1])):
            taken += 1
    assert 5 <= taken <= 45  # ~20 expected at p=0.1


def test_random_erasing_zeroes_rect(img):
    cfg = AugmentConfig(erase_p=1.0)
    found = False
    for i in range(10):
        out = np.asarray(random_erasing(jax.random.key(i), img, cfg))
        n_zero = (out == 0.0).all(axis=-1).sum()
        area = img.shape[0] * img.shape[1]
        if n_zero > 0:
            found = True
            assert n_zero <= 0.2 * area  # scale max 0.1 of area (plus rounding)
    assert found


def test_random_erasing_p_zero(img):
    cfg = AugmentConfig(erase_p=0.0)
    out = np.asarray(random_erasing(jax.random.key(0), img, cfg))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)


def test_color_jitter_bounded(img):
    out = np.asarray(color_jitter(jax.random.key(3), img, AugmentConfig()))
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
    assert not np.allclose(out, np.asarray(img))  # something changed


def test_train_augment_batch_jit(rng):
    batch = jnp.asarray(rng.uniform(0, 1, size=(4, 16, 16, 3)).astype(np.float32))
    f = jax.jit(lambda k, x: train_augment(k, x, AugmentConfig()))
    out = f(jax.random.key(0), batch)
    assert out.shape == batch.shape
    # per-image randomness: images augmented differently
    same = jnp.asarray(np.tile(np.asarray(batch[:1]), (4, 1, 1, 1)))
    out2 = np.asarray(f(jax.random.key(0), same))
    assert not np.allclose(out2[0], out2[1])


def test_eval_preprocess_is_normalize_only(img):
    np.testing.assert_allclose(
        np.asarray(eval_preprocess(img[None])), np.asarray(normalize(img[None])), atol=1e-7
    )
