"""Device-side batched square crop + bilinear resize.

The deployment-critical half of the preprocessing contract (reference does
this per-box on the host with cv2, inference_rgb.py:70-142; we do the whole
batch on device so detect -> crop -> pose runs as ONE jitted graph). The
sampling convention matches cv2.INTER_LINEAR: pixel centers at half-integer
coordinates, src = (dst + 0.5) * (size / out) - 0.5, with out-of-bounds
reads returning 0 (the reference's zero padding).

Crop parameters are per-sample scalars (x1, y1, size) in the ORIGINAL image
frame — padding never materializes; OOB is handled by masking, which is the
device-friendly equivalent of cv2.copyMakeBorder + slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_resize_bilinear(
    images: jax.Array,  # [B, H, W, C] float or uint8
    x1: jax.Array,  # [B] float crop origin (original frame; may be negative)
    y1: jax.Array,  # [B]
    size: jax.Array,  # [B] float crop side length
    out_size: int,
) -> jax.Array:
    """Batched crop+resize -> [B, out_size, out_size, C] float32."""
    images = images.astype(jnp.float32)
    B, H, W, C = images.shape
    S = out_size

    # crop-relative sampling grid (cv2 pixel-center convention). cv2 resizes
    # the CROP, so samples clamp at the crop border (edge replication inside
    # the crop window), and crop pixels outside the image read as 0.
    d = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S  # [S] in (0, 1)
    rx = d[None, :] * size[:, None] - 0.5  # [B, S] relative to crop
    ry = d[None, :] * size[:, None] - 0.5  # [B, S]

    def sample_one(img, xs, ys, ox1, oy1, sz):
        szi = sz.astype(jnp.int32)
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        wx = (xs - x0)[None, :, None]  # [1, S, 1]
        wy = (ys - y0)[:, None, None]  # [S, 1, 1]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def gather(yi, xi):
            # clamp to the crop window (cv2 edge replication within the crop)
            yi = jnp.clip(yi, 0, szi - 1)
            xi = jnp.clip(xi, 0, szi - 1)
            ya = yi + oy1.astype(jnp.int32)
            xa = xi + ox1.astype(jnp.int32)
            # crop pixels outside the image are the reference's zero padding
            valid = (
                (ya[:, None] >= 0) & (ya[:, None] < H) & (xa[None, :] >= 0) & (xa[None, :] < W)
            )
            yc = jnp.clip(ya, 0, H - 1)
            xc = jnp.clip(xa, 0, W - 1)
            vals = img[yc][:, xc]  # [S, S, C]
            return jnp.where(valid[..., None], vals, 0.0)

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    return jax.vmap(sample_one)(images, rx, ry, x1, y1, size)


def _interp_matrix(
    start: jax.Array,  # [B] crop origin along this axis (may be negative)
    size: jax.Array,  # [B] crop length
    in_dim: int,
    out_size: int,
) -> jax.Array:
    """Per-sample bilinear interpolation matrix [B, out_size, in_dim].

    Row i carries the two bilinear weights of output pixel i. Encodes the
    same semantics as the gather path: sample positions clamp to the crop
    window (cv2 edge replication inside the crop) and crop pixels outside
    the image contribute zero (the reference's zero padding).
    """
    d = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size  # [S]
    rel = d[None, :] * size[:, None] - 0.5  # [B, S]
    r0 = jnp.floor(rel)
    w1 = rel - r0  # weight of the +1 neighbor
    szi = jnp.maximum(size, 1.0)
    i0 = jnp.clip(r0, 0.0, szi[:, None] - 1.0)
    i1 = jnp.clip(r0 + 1.0, 0.0, szi[:, None] - 1.0)
    a0 = i0 + start[:, None]  # absolute pixel of neighbor 0
    a1 = i1 + start[:, None]
    cols = jnp.arange(in_dim, dtype=jnp.float32)[None, None, :]  # [1, 1, D]
    m0 = (cols == a0[..., None]).astype(jnp.float32) * (1.0 - w1)[..., None]
    m1 = (cols == a1[..., None]).astype(jnp.float32) * w1[..., None]
    return m0 + m1  # [B, S, D]; out-of-image columns simply never match


def crop_resize_matmul_windowed(
    images: jax.Array,  # [B, H, W, C]
    x1: jax.Array,
    y1: jax.Array,
    size: jax.Array,
    out_size: int,
    window: int,
    compute_dtype=jnp.float32,
    src_scale: float = 1.0,
) -> jax.Array:
    """Windowed variant of crop_resize_matmul: slice a per-sample
    [window, window] region first (one dynamic_slice per sample — a
    contiguous copy, not a gather), then build interpolation matrices over
    `window` instead of the full H/W. Cuts both the matrix-construction
    and matmul-K costs by H/window and W/window.

    Correctness requires size <= window - 2 (sizes are clamped to that, so
    oversized crops lose their outermost border; pick `window` above the
    largest expected crop — LineMOD boxes stay under ~300 px)."""
    import jax.lax as lax

    B, H, W, C = images.shape
    window = min(window, H, W)
    size = jnp.minimum(size, window - 2)

    wx0 = jnp.clip(jnp.trunc(x1), 0, W - window).astype(jnp.int32)
    wy0 = jnp.clip(jnp.trunc(y1), 0, H - window).astype(jnp.int32)

    sub = jax.vmap(
        lambda im, sy, sx: lax.dynamic_slice(im, (sy, sx, 0), (window, window, C))
    )(images, wy0, wx0)

    return crop_resize_matmul(
        sub, x1 - wx0.astype(x1.dtype), y1 - wy0.astype(y1.dtype), size,
        out_size, compute_dtype, src_scale=src_scale,
    )


def crop_resize_matmul(
    images: jax.Array,  # [B, H, W, C]
    x1: jax.Array,
    y1: jax.Array,
    size: jax.Array,
    out_size: int,
    compute_dtype=jnp.float32,
    src_scale: float = 1.0,
) -> jax.Array:
    """Crop+resize as two batched matmuls — the MXU-native formulation.

    Bilinear resampling is separable, so instead of 4 gathers per output
    pixel (gathers are slow on TPU) the whole op becomes
    V_y [B,S,H] @ img [B,H,W,C] @ V_x^T [B,W,S]: dense matmuls that ride
    the MXU and fuse with downstream normalize/conv. Numerically identical
    to `crop_resize_bilinear` in f32 (tested); pass compute_dtype=bfloat16
    for image data feeding a bf16 network (~0.4% interpolation error,
    invisible to the model) — keep f32 for metric depth.

    `src_scale` is folded into the row-interpolation matrix (linearity of
    the resample), so e.g. cropping uint8 frames with src_scale=1/255 saves
    materializing a normalized full-frame copy for the crop path.
    """
    B, H, W, C = images.shape
    S = out_size
    vy = _interp_matrix(y1, size, H, S).astype(compute_dtype)  # [B, S, H]
    vx = _interp_matrix(x1, size, W, S).astype(compute_dtype)  # [B, T, W]
    if src_scale != 1.0:
        vy = vy * jnp.asarray(src_scale, compute_dtype)
    images = images.astype(compute_dtype)
    # columns first, as plain einsums with XLA choosing the dimension
    # numbers. An earlier formulation hand-flattened each contraction into
    # [S,H]@[H,W*C] matmuls with explicit reshape/transpose glue between
    # them; measured on v5e at B=128/C=3 that ran 5.3x SLOWER (2.46 ms vs
    # 0.47 ms per batch) than letting XLA lay out the same contractions —
    # the interleaved (B,S,W,C)->(B,W,S*C) relayouts dominated.
    tmp = jnp.einsum("btw,bhwc->bhtc", vx, images,
                     preferred_element_type=compute_dtype)
    out = jnp.einsum("bsh,bhtc->bstc", vy, tmp,
                     preferred_element_type=compute_dtype)
    return out.astype(jnp.float32)


def crop_params_from_bbox(bbox_xywh: jax.Array, expansion: float = 1.2):
    """Device-side analogue of compute_crop_params' core: square crop at
    expansion * max(w, h), integer-truncated origin (int() semantics for the
    positive/negative cases via trunc), integer size.

    Returns (x1, y1, size) floats ready for crop_resize_bilinear. Matches the
    host contract: x1 = int(cx - size/2), size = int(size_f).
    """
    x, y, w, h = bbox_xywh[..., 0], bbox_xywh[..., 1], bbox_xywh[..., 2], bbox_xywh[..., 3]
    cx = x + w / 2.0
    cy = y + h / 2.0
    size_f = jnp.maximum(w, h) * expansion

    def trunc_like_int(v):
        # float32-robust int() truncation: the host contract computes these in
        # float64; when the float32 value sits within 1e-3 of an integer,
        # snap to it before truncating (e.g. 19.999998 -> 20, not 19).
        r = jnp.round(v)
        v = jnp.where(jnp.abs(v - r) < 1e-3, r, v)
        return jnp.trunc(v)

    x1 = trunc_like_int(cx - size_f / 2.0)
    y1 = trunc_like_int(cy - size_f / 2.0)
    size = trunc_like_int(size_f)
    return x1, y1, size
