"""YOLOv8 detection model (backbone + PAN-FPN neck + decoupled DFL head).

Flax re-design of the ultralytics YOLOv8 graph the reference trains and
runs (scripts/training/train_yolo.py:41, scripts/inference/*:yolo(img)).
Depth/width/ratio multiples select the size; 'n' (the reference's choice,
yolov8n.pt) is depth=1/3, width=1/4, ratio=2.

The head predicts, per feature level (strides 8/16/32):
  box branch -> 4 * reg_max distribution-focal logits
  cls branch -> nc class logits
Raw per-level maps are returned; decoding (DFL expectation, anchor offsets,
NMS) lives in decode.py so train and inference share one forward graph.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import C2f, ConvBN, SPPF, upsample2x


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 13  # LineMOD (reference prepare_yolo.py writes nc=13)
    depth: float = 1.0 / 3.0  # 'n'
    width: float = 0.25
    ratio: float = 2.0
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    def ch(self, c: int) -> int:
        return max(int(round(c * self.width)), 1)

    def depth_n(self, n: int) -> int:
        return max(int(round(n * self.depth)), 1)


class YoloBackbone(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        d = c.depth_n
        w = c.ch
        c5 = int(w(512) * c.ratio)

        x = ConvBN(w(64), 3, 2, dtype=c.dtype, name="stem")(x, train)  # P1
        x = ConvBN(w(128), 3, 2, dtype=c.dtype, name="down1")(x, train)  # P2
        x = C2f(w(128), d(3), True, dtype=c.dtype, name="c2f_1")(x, train)
        x = ConvBN(w(256), 3, 2, dtype=c.dtype, name="down2")(x, train)  # P3
        p3 = C2f(w(256), d(6), True, dtype=c.dtype, name="c2f_2")(x, train)
        x = ConvBN(w(512), 3, 2, dtype=c.dtype, name="down3")(p3, train)  # P4
        p4 = C2f(w(512), d(6), True, dtype=c.dtype, name="c2f_3")(x, train)
        x = ConvBN(c5, 3, 2, dtype=c.dtype, name="down4")(p4, train)  # P5
        x = C2f(c5, d(3), True, dtype=c.dtype, name="c2f_4")(x, train)
        p5 = SPPF(c5, dtype=c.dtype, name="sppf")(x, train)
        return p3, p4, p5


class YoloNeck(nn.Module):
    """PAN-FPN: top-down then bottom-up feature fusion."""

    cfg: YoloConfig

    @nn.compact
    def __call__(self, p3, p4, p5, train: bool = False):
        c = self.cfg
        d = c.depth_n
        w = c.ch
        c5 = int(w(512) * c.ratio)

        # top-down
        t4 = C2f(w(512), d(3), False, dtype=c.dtype, name="td_p4")(
            jnp.concatenate([upsample2x(p5), p4], axis=-1), train
        )
        t3 = C2f(w(256), d(3), False, dtype=c.dtype, name="td_p3")(
            jnp.concatenate([upsample2x(t4), p3], axis=-1), train
        )
        # bottom-up
        b4 = C2f(w(512), d(3), False, dtype=c.dtype, name="bu_p4")(
            jnp.concatenate(
                [ConvBN(w(256), 3, 2, dtype=c.dtype, name="bu_down3")(t3, train), t4],
                axis=-1,
            ),
            train,
        )
        b5 = C2f(c5, d(3), False, dtype=c.dtype, name="bu_p5")(
            jnp.concatenate(
                [ConvBN(w(512), 3, 2, dtype=c.dtype, name="bu_down4")(b4, train), p5],
                axis=-1,
            ),
            train,
        )
        return t3, b4, b5


class DetectHead(nn.Module):
    """Decoupled box/cls head with distribution-focal box regression."""

    cfg: YoloConfig
    in_channels: Sequence[int]

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c = self.cfg
        c_box = max(16, self.in_channels[0] // 4, c.reg_max * 4)
        c_cls = max(self.in_channels[0], min(c.num_classes, 100))

        outs = []
        for i, x in enumerate(feats):
            box = ConvBN(c_box, 3, dtype=c.dtype, name=f"box{i}_0")(x, train)
            box = ConvBN(c_box, 3, dtype=c.dtype, name=f"box{i}_1")(box, train)
            box = nn.Conv(4 * c.reg_max, (1, 1), dtype=c.dtype, name=f"box{i}_out")(box)

            # cls bias init: prior for rare positives (ultralytics bias_init)
            stride = c.strides[i]
            prior = math.log(5.0 / c.num_classes / (640.0 / stride) ** 2)
            cls = ConvBN(c_cls, 3, dtype=c.dtype, name=f"cls{i}_0")(x, train)
            cls = ConvBN(c_cls, 3, dtype=c.dtype, name=f"cls{i}_1")(cls, train)
            cls = nn.Conv(
                c.num_classes, (1, 1), dtype=c.dtype,
                bias_init=nn.initializers.constant(prior), name=f"cls{i}_out",
            )(cls)
            outs.append((box, cls))
        return outs


class YoloV8(nn.Module):
    """Full detector. Returns list of (box_logits [B,Hi,Wi,4*reg_max],
    cls_logits [B,Hi,Wi,nc]) per stride level."""

    cfg: YoloConfig = YoloConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        p3, p4, p5 = YoloBackbone(c, name="backbone")(x, train)
        n3, n4, n5 = YoloNeck(c, name="neck")(p3, p4, p5, train)
        feats = (n3, n4, n5)
        head = DetectHead(c, tuple(f.shape[-1] for f in feats), name="head")
        return head(feats, train)
