"""YOLOv8 building blocks in Flax linen (NHWC).

TPU-native implementation of the capabilities the reference delegates to
ultralytics (reference: scripts/training/train_yolo.py:13,41 — the entire
detector model graph lives in the external library). Architecture follows
the public YOLOv8 design: Conv(+BN+SiLU), C2f with split/concat feature
reuse, SPPF pooling pyramid. BatchNorm uses ultralytics' eps=1e-3,
momentum=0.03 so converted weights behave identically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_MOMENTUM = 1.0 - 0.03  # flax momentum = 1 - torch momentum
BN_EPS = 1e-3


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + SiLU (ultralytics `Conv`)."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """Two 3x3 convs with optional residual (ultralytics `Bottleneck`)."""

    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features, 3, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial bottleneck with 2 convs (ultralytics `C2f`).

    cv1 projects to 2*hidden and splits; n bottlenecks chain on the second
    half; all (2 + n) chunks concat into cv2.
    """

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        chunks = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            chunks.append(
                Bottleneck(hidden, self.shortcut, dtype=self.dtype, name=f"m{i}")(
                    chunks[-1], train
                )
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(chunks, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (ultralytics `SPPF`): three chained
    5x5 stride-1 max pools, concat, project."""

    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.pool // 2
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (self.pool, self.pool), strides=(1, 1),
                    padding=[(p, p), (p, p)],
                )
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample (ultralytics nn.Upsample mode='nearest')."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
