"""On-device photometric augmentation (pure jnp, fused by XLA into the step).

TPU-native replacement for the reference's torchvision transform stack
(scripts/training/train_rgb.py:43-50):
    ColorJitter(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.05)
    RandomGrayscale(p=0.1)            # train_rgb only
    Normalize(ImageNet mean/std)
    RandomErasing(p=0.2, scale=(0.02, 0.1))   # after normalize

Host-side per-sample PIL ops become batched elementwise device math keyed by
`jax.random` — everything here fuses with the model's first conv under jit,
so augmentation costs approximately zero extra HBM round-trips. Semantics
match torchvision distributionally: identical factor distributions and order
randomization; exact RNG streams differ by construction.

All images are float32 [B, H, W, 3] in [0, 1] (pre-normalize).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_GRAY_W = jnp.array([0.299, 0.587, 0.114])  # ITU-R 601, torchvision's weights


def to_float01(rgb: jax.Array) -> jax.Array:
    """Accept uint8 [0, 255] or float [0, 1] images; return float32 [0, 1].

    Feeding uint8 from the host quarters the H2D transfer (the loader's
    biggest per-step cost on tunneled backends); the division is bit-exact
    with the host-side float path."""
    if rgb.dtype == jnp.uint8:
        return rgb.astype(jnp.float32) / 255.0
    return rgb


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    brightness: float = 0.3
    contrast: float = 0.3
    saturation: float = 0.3
    hue: float = 0.05
    grayscale_p: float = 0.1  # 0.0 disables (only train_rgb uses it)
    erase_p: float = 0.2
    erase_scale: Tuple[float, float] = (0.02, 0.1)
    erase_ratio: Tuple[float, float] = (0.3, 3.3)


def rgb_to_grayscale(img: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 1] luminance."""
    return jnp.sum(img * _GRAY_W, axis=-1, keepdims=True)


def _blend(img: jax.Array, other: jax.Array, factor: jax.Array) -> jax.Array:
    return jnp.clip(factor * img + (1.0 - factor) * other, 0.0, 1.0)


def adjust_brightness(img: jax.Array, factor: jax.Array) -> jax.Array:
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img: jax.Array, factor: jax.Array) -> jax.Array:
    # torchvision blends toward the mean of the grayscale image
    mean = jnp.mean(rgb_to_grayscale(img), axis=(-3, -2, -1), keepdims=True)
    return _blend(img, mean, factor)


def adjust_saturation(img: jax.Array, factor: jax.Array) -> jax.Array:
    return _blend(img, rgb_to_grayscale(img), factor)


def _rgb_to_hsv(img: jax.Array) -> jax.Array:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, h, 0.0)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # branch-free sextant select. jnp.choose lowers to a gather over the
    # stacked [6, ...] candidates, and XLA:TPU's generic-gather lowering is
    # catastrophic at image shapes: the three chooses made adjust_hue cost
    # ~30 ms per call on [32, 224, 224] v5e — ~390 ms/step of augmentation,
    # 7x the dual-ResNet50 fwd+bwd it was feeding (PERF.md round 3). The
    # equivalent elementwise where-chain is pure VPU work and fuses.
    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0,
            jnp.where(
                i == 1, c1,
                jnp.where(i == 2, c2,
                          jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))),
        )

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img: jax.Array, delta: jax.Array) -> jax.Array:
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] + delta) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter_batch(key: jax.Array, img: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """torchvision ColorJitter on a batch [B, H, W, 3]: per-image random
    factors and per-image random op order.

    Deliberately BRANCH-FREE: at each of the 4 order positions all four ops
    are computed and a per-image select picks one. 16 elementwise passes
    that XLA fuses — measured ~1 ms/step at batch 32 on v5e. The previous
    per-image formulation (vmapped `lax.fori_loop` over `lax.switch`)
    measured ~350 ms/step on the same shapes: batched control flow inside
    vmap is the single most expensive construct in the whole train step
    (PERF.md round 3, "the training wall was the augmentation").
    """
    k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 5)
    B = img.shape[0]
    shp = (B, 1, 1, 1)
    fb = jax.random.uniform(k_b, shp, minval=max(0.0, 1 - cfg.brightness), maxval=1 + cfg.brightness)
    fc = jax.random.uniform(k_c, shp, minval=max(0.0, 1 - cfg.contrast), maxval=1 + cfg.contrast)
    fs = jax.random.uniform(k_s, shp, minval=max(0.0, 1 - cfg.saturation), maxval=1 + cfg.saturation)
    fh = jax.random.uniform(k_h, (B, 1, 1), minval=-cfg.hue, maxval=cfg.hue)
    # uniform per-image permutation: argsort of iid uniforms
    order = jnp.argsort(jax.random.uniform(k_perm, (B, 4)), axis=-1)

    x = img
    for p in range(4):
        o = order[:, p][:, None, None, None]
        x = jnp.where(
            o == 0,
            adjust_brightness(x, fb),
            jnp.where(
                o == 1,
                adjust_contrast(x, fc),
                jnp.where(o == 2, adjust_saturation(x, fs), adjust_hue(x, fh)),
            ),
        )
    return x


def color_jitter(key: jax.Array, img: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """ColorJitter on one image [H, W, 3] (test/API surface; the train path
    uses color_jitter_batch directly)."""
    return color_jitter_batch(key, img[None], cfg)[0]


def random_grayscale(key: jax.Array, img: jax.Array, p: float) -> jax.Array:
    gray = jnp.broadcast_to(rgb_to_grayscale(img), img.shape)
    take = jax.random.uniform(key, ()) < p
    return jnp.where(take, gray, img)


def random_grayscale_batch(key: jax.Array, img: jax.Array, p: float) -> jax.Array:
    """Per-image RandomGrayscale on a batch [B, H, W, 3]."""
    B = img.shape[0]
    gray = jnp.broadcast_to(rgb_to_grayscale(img), img.shape)
    take = jax.random.uniform(key, (B, 1, 1, 1)) < p
    return jnp.where(take, gray, img)


def normalize(img: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def random_erasing(key: jax.Array, img: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """torchvision RandomErasing (value=0) on one normalized image [H, W, C].

    Static-shape version: sample area/aspect once (torchvision retries up to
    10x; a single draw from the same distribution is distributionally close),
    skip if the rectangle doesn't fit.
    """
    H, W = img.shape[0], img.shape[1]
    k_p, k_a, k_r, k_y, k_x = jax.random.split(key, 5)
    area = H * W
    target = jax.random.uniform(key=k_a, minval=cfg.erase_scale[0], maxval=cfg.erase_scale[1]) * area
    log_ratio = jax.random.uniform(
        key=k_r, minval=jnp.log(cfg.erase_ratio[0]), maxval=jnp.log(cfg.erase_ratio[1])
    )
    ratio = jnp.exp(log_ratio)
    h = jnp.round(jnp.sqrt(target * ratio)).astype(jnp.int32)
    w = jnp.round(jnp.sqrt(target / ratio)).astype(jnp.int32)
    fits = (h < H) & (w < W)
    take = (jax.random.uniform(k_p, ()) < cfg.erase_p) & fits
    h = jnp.clip(h, 1, H - 1)
    w = jnp.clip(w, 1, W - 1)
    y0 = jax.random.randint(k_y, (), 0, H - h + 1)
    x0 = jax.random.randint(k_x, (), 0, W - w + 1)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    inside = (rows >= y0) & (rows < y0 + h) & (cols >= x0) & (cols < x0 + w)
    mask = take & inside
    return jnp.where(mask[..., None], 0.0, img)


def random_erasing_batch(key: jax.Array, img: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """torchvision RandomErasing (value=0) on a batch [B, H, W, C] of
    normalized images, per-image randomness, branch-free (same single-draw
    semantics as random_erasing; the per-sample origin uses floor(u * range)
    instead of randint — the same distribution, batchable with per-sample
    ranges)."""
    B, H, W, _ = img.shape
    k_p, k_a, k_r, k_y, k_x = jax.random.split(key, 5)
    area = H * W
    target = jax.random.uniform(
        k_a, (B,), minval=cfg.erase_scale[0], maxval=cfg.erase_scale[1]) * area
    log_ratio = jax.random.uniform(
        k_r, (B,), minval=jnp.log(cfg.erase_ratio[0]),
        maxval=jnp.log(cfg.erase_ratio[1]))
    ratio = jnp.exp(log_ratio)
    h = jnp.round(jnp.sqrt(target * ratio)).astype(jnp.int32)
    w = jnp.round(jnp.sqrt(target / ratio)).astype(jnp.int32)
    fits = (h < H) & (w < W)
    take = (jax.random.uniform(k_p, (B,)) < cfg.erase_p) & fits
    h = jnp.clip(h, 1, H - 1)
    w = jnp.clip(w, 1, W - 1)
    y0 = jnp.floor(
        jax.random.uniform(k_y, (B,)) * (H - h + 1).astype(jnp.float32)
    ).astype(jnp.int32)
    x0 = jnp.floor(
        jax.random.uniform(k_x, (B,)) * (W - w + 1).astype(jnp.float32)
    ).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]  # [1, H, 1]
    cols = jnp.arange(W)[None, None, :]  # [1, 1, W]
    yb, xb, hb, wb = (v[:, None, None] for v in (y0, x0, h, w))
    inside = (rows >= yb) & (rows < yb + hb) & (cols >= xb) & (cols < xb + wb)
    mask = take[:, None, None] & inside  # [B, H, W]
    return jnp.where(mask[..., None], 0.0, img)


def train_augment(key: jax.Array, rgb: jax.Array, cfg: AugmentConfig = AugmentConfig()) -> jax.Array:
    """Full train-time stack on a batch [B, H, W, 3] in [0, 1]:
    jitter -> (grayscale) -> normalize -> erase. Per-image randomness.
    Accepts uint8 (preferred H2D format) or float32 [0, 1].

    Fully BATCHED, branch-free formulation. The original per-image version
    (`jax.vmap` over `color_jitter`'s `fori_loop`+`switch`) measured
    ~357 ms/step at batch 32x224x224 on v5e — it was the dominant cost of
    the ENTIRE train step, 7x the dual-ResNet50 fwd+bwd (PERF.md round 3).
    Batched selects bring it to elementwise-bandwidth cost."""
    rgb = to_float01(rgb)
    k1, k2, k3 = jax.random.split(key, 3)
    img = color_jitter_batch(k1, rgb, cfg)
    if cfg.grayscale_p > 0:
        img = random_grayscale_batch(k2, img, cfg.grayscale_p)
    img = normalize(img)
    return random_erasing_batch(k3, img, cfg)


def eval_preprocess(rgb: jax.Array) -> jax.Array:
    """Eval path: normalize only (train_rgb.py:52-56)."""
    return normalize(to_float01(rgb))
