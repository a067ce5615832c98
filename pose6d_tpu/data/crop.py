"""The square-crop preprocessing contract, as pure functions.

This is the most behavior-dense part of the reference
(data/dataset_rgb.py:83-147, data/dataset_rgbd.py:85-206): bbox jitter,
square crop at 1.2x max(w, h) with integer-truncation coordinates, zero
padding, bilinear resize, bbox-center remapping, and intrinsics adjustment.
The scalar bookkeeping is isolated here in `compute_crop_params` so the
host (numpy/cv2) and device (jnp/Pallas) crop implementations share one
source of truth and the inference scripts reuse the exact training recipe
(scripts/inference/inference_rgbd_geometric.py:117-167 mirrors the dataset).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

CROP_EXPANSION = 1.2


@dataclasses.dataclass(frozen=True)
class CropParams:
    """Everything needed to execute and account for one square crop."""

    # crop origin in the PADDED frame and integer crop size
    x1: int
    y1: int
    size: int
    # zero padding applied to the original frame
    pad_l: int
    pad_t: int
    pad_r: int
    pad_b: int
    # resize scale: img_size / size
    scale: float
    # original-frame bbox center (pre-jitter: the GT signal)
    center_orig: Tuple[float, float]
    # bbox center mapped into resized-crop pixels, clipped to [0, img_size-1]
    center_crop: Tuple[float, float]
    img_size: int


def jitter_bbox(
    bbox: np.ndarray,
    rng: np.random.Generator,
    pos_frac: float,
    scale_frac: float,
) -> np.ndarray:
    """Train-time bbox jitter. RGB uses (0.15, 0.2), RGBD uses (0.05, 0.1)
    (data/dataset_rgb.py:101-110, data/dataset_rgbd.py:110-118). Offsets are
    truncated to ints exactly like the reference."""
    x, y, w, h = bbox
    jx = int(rng.uniform(-pos_frac, pos_frac) * w)
    jy = int(rng.uniform(-pos_frac, pos_frac) * h)
    sw = int(rng.uniform(-scale_frac, scale_frac) * w)
    sh = int(rng.uniform(-scale_frac, scale_frac) * h)
    return np.asarray([x + jx, y + jy, w + sw, h + sh], dtype=np.float64)


def compute_crop_params(
    bbox_jittered: np.ndarray,
    bbox_orig: np.ndarray,
    img_w: int,
    img_h: int,
    img_size: int = 224,
) -> CropParams:
    """Scalar crop bookkeeping, bit-matching the reference's int() truncations."""
    x, y, w, h = bbox_jittered
    xo, yo, wo, ho = bbox_orig

    c_x, c_y = x + w / 2.0, y + h / 2.0
    size_f = max(w, h) * CROP_EXPANSION
    x1 = int(c_x - size_f / 2.0)
    y1 = int(c_y - size_f / 2.0)
    size = int(size_f)

    pad_l = max(0, -x1)
    pad_t = max(0, -y1)
    pad_r = max(0, (x1 + size) - img_w)
    pad_b = max(0, (y1 + size) - img_h)
    # after padding, the crop origin moves into the padded frame
    x1p = x1 + pad_l
    y1p = y1 + pad_t

    scale = img_size / size if size > 0 else 0.0

    center_orig = (xo + wo / 2.0, yo + ho / 2.0)
    # center mapped into resized-crop coordinates (data/dataset_rgbd.py:147-156)
    ccx = (center_orig[0] + pad_l - x1p) * scale
    ccy = (center_orig[1] + pad_t - y1p) * scale
    ccx = float(np.clip(ccx, 0, img_size - 1))
    ccy = float(np.clip(ccy, 0, img_size - 1))

    return CropParams(
        x1=x1p, y1=y1p, size=size,
        pad_l=pad_l, pad_t=pad_t, pad_r=pad_r, pad_b=pad_b,
        scale=scale, center_orig=center_orig, center_crop=(ccx, ccy),
        img_size=img_size,
    )


def adjust_K_for_crop(cam_K: np.ndarray, p: CropParams) -> np.ndarray:
    """Crop-frame intrinsics (data/dataset_rgbd.py:158-169). Note: uses the
    PADDED-frame x1 — i.e. cx' = (cx + pad_l - x1_padded) * s."""
    fx, fy = cam_K[0, 0], cam_K[1, 1]
    cx, cy = cam_K[0, 2], cam_K[1, 2]
    return np.asarray(
        [
            [fx * p.scale, 0.0, (cx + p.pad_l - p.x1) * p.scale],
            [0.0, fy * p.scale, (cy + p.pad_t - p.y1) * p.scale],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def crop_resize_image(
    image: np.ndarray, p: CropParams, interpolation: Optional[int] = None
) -> np.ndarray:
    """Host-side crop+resize via cv2 (the golden-reference path).

    Pads with zeros, crops [y1:y1+size, x1:x1+size] in the padded frame, and
    resizes to (img_size, img_size) with cv2's default bilinear.
    """
    import cv2

    if interpolation is None:
        interpolation = cv2.INTER_LINEAR
    if p.pad_l or p.pad_t or p.pad_r or p.pad_b:
        image = cv2.copyMakeBorder(
            image, p.pad_t, p.pad_b, p.pad_l, p.pad_r, cv2.BORDER_CONSTANT, value=0
        )
    crop = image[p.y1 : p.y1 + p.size, p.x1 : p.x1 + p.size]
    return cv2.resize(crop, (p.img_size, p.img_size), interpolation=interpolation)


# Depth normalization constants (data/dataset_rgbd.py:181-186)
DEPTH_MIN_M = 0.1
DEPTH_MAX_M = 1.6
DEPTH_INVALID_M = 0.01


def normalize_depth(depth_raw_m: np.ndarray) -> np.ndarray:
    """Global linear depth normalization for the CNN input channel."""
    d = (depth_raw_m - DEPTH_MIN_M) / (DEPTH_MAX_M - DEPTH_MIN_M)
    d = np.clip(d, 0.0, 1.0)
    d = np.where(depth_raw_m < DEPTH_INVALID_M, 0.0, d)
    return d.astype(np.float32)
