"""int8 PTQ for the YOLOv8 detector (serving mode, ops/quant.py sibling).

Same recipe as the ResNet towers: fold BN into each ConvBN (ultralytics
eps=1e-3), per-output-channel symmetric int8 weights, static per-tensor
activation scales from calibration, s8 x s8 -> s32 convs on the MXU
(measured 1.92-1.99x bf16 on v5e, scripts/probe_int8.py). SiLU runs on the
VPU in the requantize epilogue. The four tiny 1x1 head OUTPUT convs
(box/cls logits, bias, no BN) stay float — they are <1% of the FLOPs and
keeping them f32 preserves logit fidelity for DFL/NMS.

The explicit forward mirrors models/yolo/model.py exactly (same module
names and wiring) and is equality-tested against YoloV8.apply in
tests/test_yolo_quant.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.quant import quantize_weights_per_channel
from .model import YoloConfig

BN_EPS = 1e-3


# --------------------------------------------------------------------- folding


def fold_yolo(params: Dict, batch_stats: Dict) -> Dict:
    """Fold every ConvBN of the YOLO tree into {path: {"w", "b"}}; head
    output convs (bias, no BN) pass through as {"w", "b", "float": True}."""
    out: Dict = {}

    def walk(p, s, path):
        if "conv" in p and "bn" in p:
            g = np.asarray(p["bn"]["scale"]) / np.sqrt(
                np.asarray(s["bn"]["var"]) + BN_EPS)
            out[path] = {
                "w": (np.asarray(p["conv"]["kernel"]) * g).astype(np.float32),
                "b": (np.asarray(p["bn"]["bias"])
                      - np.asarray(s["bn"]["mean"]) * g).astype(np.float32),
            }
            return
        if "kernel" in p:  # head output conv (has bias, no BN)
            out[path] = {
                "w": np.asarray(p["kernel"], np.float32),
                "b": np.asarray(p["bias"], np.float32),
                "float": True,
            }
            return
        for k, v in p.items():
            walk(v, s.get(k, {}) if isinstance(s, dict) else {},
                 f"{path}/{k}" if path else k)

    walk(params, batch_stats, "")
    return out


def quantize_yolo_folded(folded: Dict, act_scales: Dict[str, float]) -> Dict:
    q: Dict = {}
    for name, e in folded.items():
        if e.get("float"):
            q[name] = {"w": jnp.asarray(e["w"]), "b": jnp.asarray(e["b"]),
                       "float": True}
            continue
        w_q, sc = quantize_weights_per_channel(e["w"])
        q[name] = {"w": jnp.asarray(w_q), "s": jnp.asarray(sc),
                   "b": jnp.asarray(e["b"]), "a": jnp.float32(act_scales[name])}
    return q


# -------------------------------------------------------------------- forwards


def _conv(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _maxpool5(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 5, 5, 1),
                             (1, 1, 1, 1), [(0, 0), (2, 2), (2, 2), (0, 0)])


def _forward(cfg: YoloConfig, x, convbn, head_out):
    """Shared wiring (float/int8 agnostic): `convbn(name, x, stride)` is a
    folded conv + SiLU; `head_out(name, x)` a float 1x1 logit conv."""

    def bottleneck(prefix, x, shortcut):
        y = convbn(f"{prefix}/cv1", x, 1)
        y = convbn(f"{prefix}/cv2", y, 1)
        return x + y if (shortcut and x.shape[-1] == y.shape[-1]) else y

    def c2f(prefix, x, n, shortcut):
        y = convbn(f"{prefix}/cv1", x, 1)
        h = y.shape[-1] // 2
        chunks = [y[..., :h], y[..., h:]]
        for i in range(n):
            chunks.append(bottleneck(f"{prefix}/m{i}", chunks[-1], shortcut))
        return convbn(f"{prefix}/cv2", jnp.concatenate(chunks, -1), 1)

    def sppf(prefix, x):
        x = convbn(f"{prefix}/cv1", x, 1)
        pools = [x]
        for _ in range(3):
            pools.append(_maxpool5(pools[-1]))
        return convbn(f"{prefix}/cv2", jnp.concatenate(pools, -1), 1)

    def up(x):
        B, H, W, C = x.shape
        return jnp.broadcast_to(
            x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
        ).reshape(B, 2 * H, 2 * W, C)

    d = cfg.depth_n
    x = convbn("backbone/stem", x, 2)
    x = convbn("backbone/down1", x, 2)
    x = c2f("backbone/c2f_1", x, d(3), True)
    x = convbn("backbone/down2", x, 2)
    p3 = c2f("backbone/c2f_2", x, d(6), True)
    x = convbn("backbone/down3", p3, 2)
    p4 = c2f("backbone/c2f_3", x, d(6), True)
    x = convbn("backbone/down4", p4, 2)
    x = c2f("backbone/c2f_4", x, d(3), True)
    p5 = sppf("backbone/sppf", x)

    t4 = c2f("neck/td_p4", jnp.concatenate([up(p5), p4], -1), d(3), False)
    t3 = c2f("neck/td_p3", jnp.concatenate([up(t4), p3], -1), d(3), False)
    b4 = c2f("neck/bu_p4", jnp.concatenate(
        [convbn("neck/bu_down3", t3, 2), t4], -1), d(3), False)
    b5 = c2f("neck/bu_p5", jnp.concatenate(
        [convbn("neck/bu_down4", b4, 2), p5], -1), d(3), False)

    outs = []
    for i, f in enumerate((t3, b4, b5)):
        b = convbn(f"head/box{i}_0", f, 1)
        b = convbn(f"head/box{i}_1", b, 1)
        box = head_out(f"head/box{i}_out", b)
        c = convbn(f"head/cls{i}_0", f, 1)
        c = convbn(f"head/cls{i}_1", c, 1)
        cls = head_out(f"head/cls{i}_out", c)
        outs.append((box, cls))
    return outs


def yolo_folded_forward(folded: Dict, cfg: YoloConfig, x, observer=None):
    """Float forward over folded params — numerically equal (eval) to
    YoloV8.apply; `observer(name, x)` harvests calibration inputs."""

    def convbn(name, x, stride):
        if observer is not None:
            observer(name, x)
        e = folded[name]
        pad = e["w"].shape[0] // 2
        return jax.nn.silu(_conv(x, jnp.asarray(e["w"]), stride, pad) + e["b"])

    def head_out(name, x):
        e = folded[name]
        return _conv(x, jnp.asarray(e["w"]), 1, 0) + e["b"]

    return _forward(cfg, x, convbn, head_out)


def yolo_int8_forward(q: Dict, cfg: YoloConfig, x, compute_dtype=jnp.float32):
    """The int8 serving forward: ConvBN convs run s8 x s8 -> s32; SiLU and
    requantization ride the VPU in compute_dtype."""

    def convbn(name, x, stride):
        e = q[name]
        pad = e["w"].shape[0] // 2
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / e["a"]),
                      -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, e["w"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = (y.astype(compute_dtype) * (e["a"] * e["s"]).astype(compute_dtype)
             + e["b"].astype(compute_dtype))
        return jax.nn.silu(y)

    def head_out(name, x):
        e = q[name]
        return _conv(x.astype(jnp.float32), e["w"], 1, 0) + e["b"]

    return _forward(cfg, x, convbn, head_out)


def calibrate_yolo(folded: Dict, cfg: YoloConfig, batches) -> Dict[str, float]:
    maxes: Dict[str, float] = {}
    for xb in batches:
        vals: Dict[str, jax.Array] = {}

        def observer(name, x):
            vals[name] = jnp.max(jnp.abs(x))

        yolo_folded_forward(folded, cfg, jnp.asarray(xb), observer=observer)
        for name, v in vals.items():
            maxes[name] = max(maxes.get(name, 0.0), float(v))
    return {n: max(v, 1e-12) / 127.0 for n, v in maxes.items()}


def quantize_yolo_from_variables(variables: Dict, cfg: YoloConfig,
                                 calib_batches) -> Dict:
    """One-call PTQ for the detector: variables ({'params','batch_stats'})
    + calibration frames (normalized, [B,H,W,3]) -> int8 serving tree."""
    folded = fold_yolo(variables["params"], variables["batch_stats"])
    scales = calibrate_yolo(folded, cfg,
                            [np.asarray(b, np.float32) for b in calib_batches])
    return quantize_yolo_folded(folded, scales)
