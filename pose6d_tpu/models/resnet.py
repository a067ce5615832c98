"""ResNet-50 backbone in Flax linen (NHWC, TPU-native).

Functional re-design of the torchvision ResNet50 the reference uses as the
backbone of all four pose nets (reference: models/pose_net_rgb.py:18-20).
Layout is NHWC (TPU-preferred); BatchNorm running statistics live in the
`batch_stats` collection and can be cross-device synced via `axis_name`.

The depth branch of the RGBD variant uses `in_channels=1`; its pretrained
initialization (conv1 weights summed over RGB channels, reference:
models/pose_net_rgbd.py:53-59) is reproduced by the weight converter in
`convert.py`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class BottleneckBlock(nn.Module):
    """ResNet v1 bottleneck: 1x1 -> 3x3 -> 1x1 with expansion 4."""

    features: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    zero_init_residual: bool = True  # see ResNet.zero_init_residual

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.features, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # explicit symmetric padding: torch pads 3x3/s2 convs (1,1), whereas
        # flax 'SAME' pads (0,1) — a one-pixel grid shift that breaks
        # torchvision weight parity
        y = self.conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], name="conv2",
        )(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.features * 4, (1, 1), name="conv3")(y)
        y = self.norm(
            name="bn3",
            scale_init=(nn.initializers.zeros if self.zero_init_residual
                        else nn.initializers.ones),
        )(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides), name="downsample_conv"
            )(residual)
            residual = self.norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet v1. `stage_sizes=(3, 4, 6, 3)` gives ResNet-50.

    Returns globally average-pooled features [B, 2048] (the analogue of the
    reference's `backbone(x).view(B, -1)` after stripping the fc layer).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_filters: int = 64
    in_channels: int = 3
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # Space-to-depth stem: the 7x7/s2 conv on C=3 input pads its 3 channels
    # to the MXU's 128 lanes (~40x waste). Rearranging 2x2 pixel blocks into
    # channels (C -> 4C) makes it an exactly-equivalent 4x4/s1 conv — the
    # classic MLPerf TPU ResNet trick. Weight-convertible both ways
    # (convert.py: s2d_conv1_weights).
    stem_space_to_depth: bool = False
    # FROM-SCRATCH INIT DEVIATION (documented): zero-init the last BN gamma
    # of each bottleneck so residual blocks start as identity — a standard
    # training nicety ("Bag of Tricks", He et al.). torchvision's default is
    # zero_init_residual=False (gamma=1); the difference only matters for
    # from-scratch runs (converted pretrained weights overwrite gamma), where
    # it mildly improves early dynamics. Set False for exact torchvision
    # from-scratch init parity.
    zero_init_residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )

        if self.stem_space_to_depth:
            B, H, W, C = x.shape
            x = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
            x = conv(
                self.num_filters, (4, 4), strides=(1, 1),
                padding=[(2, 1), (2, 1)], name="conv1",
            )(x)
        else:
            x = conv(
                self.num_filters, (7, 7), strides=(2, 2),
                padding=[(3, 3), (3, 3)], name="conv1",
            )(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = BottleneckBlock(
                    features=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    zero_init_residual=self.zero_init_residual,
                    name=f"layer{i + 1}_{j}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 2048]
        return x


def ResNet50(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), **kwargs)
