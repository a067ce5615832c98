"""Post-training int8 quantization for the ResNet50 backbones (serving mode).

v5e's MXU runs s8 x s8 -> s32 at 2x its bf16 rate (394 vs 197 TOPS).
PERF.md's stage profile puts the rgbd flagship at its bf16 conv
speed-of-light (59-60% MFU on every conv graph, 4,685 fps zero-overhead
ceiling vs the 5,000 fps target) — int8 is the one lever that raises the
ceiling itself without touching the architecture. This module implements
the standard PTQ recipe, TPU-first:

  1. FOLD BatchNorm into the preceding conv (inference-only identity).
  2. Per-OUTPUT-CHANNEL symmetric int8 weight quantization (the weight
     scale rides the conv's output channel, so requantization is one
     broadcast multiply fused by XLA).
  3. Static per-tensor activation scales from a calibration pass (running
     abs-max over representative batches), so the quantize step before
     each conv is a scalar multiply + round + clip on the VPU — no
     data-dependent reductions in the serving graph.
  4. The conv itself runs s8 x s8 -> s32 via
     `lax.conv_general_dilated(..., preferred_element_type=int32)`.

The reference has no quantization (torch fp32/fp16 CUDA, SURVEY.md section
2.2); this is an opt-in serving mode — accuracy parity of the float path
is untouched, and the quantized path's accuracy cost is measured on the
trained fixture checkpoints (scripts/eval_e2e.py --int8-backbone).

All functions are pure and jit-compatible; the quantized forward mirrors
models/resnet.py exactly (same stage/block/padding structure).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STAGE_SIZES = (3, 4, 6, 3)  # ResNet-50


# --------------------------------------------------------------------- folding


def _fold_one(conv_kernel, bn, eps=1e-5):
    """Fold BN(scale, bias, mean, var) into the conv kernel: returns
    (w_folded [kh,kw,ci,co], bias [co])."""
    g = bn["scale"] / np.sqrt(bn["var"] + eps)
    w = np.asarray(conv_kernel) * g  # broadcast over the trailing out-channel
    b = bn["bias"] - bn["mean"] * g
    return w.astype(np.float32), np.asarray(b, np.float32)


def fold_bn_resnet(params: Dict, batch_stats: Dict, eps: float = 1e-5) -> Dict:
    """Fold every conv+BN pair of a ResNet50 param tree (models/resnet.py
    naming) into {name: {"w": f32 kernel, "b": f32 bias}}; name is the conv's
    flax path joined with '/'."""

    def fold(out_name, p_scope, s_scope, conv_name, bn_name):
        bn = {
            "scale": np.asarray(p_scope[bn_name]["scale"]),
            "bias": np.asarray(p_scope[bn_name]["bias"]),
            "mean": np.asarray(s_scope[bn_name]["mean"]),
            "var": np.asarray(s_scope[bn_name]["var"]),
        }
        w, b = _fold_one(p_scope[conv_name]["kernel"], bn, eps)
        out[out_name] = {"w": w, "b": b}

    out: Dict = {}
    fold("conv1", params, batch_stats, "conv1", "bn1")
    for i, n_blocks in enumerate(STAGE_SIZES):
        for j in range(n_blocks):
            blk = f"layer{i + 1}_{j}"
            p, s = params[blk], batch_stats[blk]
            for c, b in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
                fold(f"{blk}/{c}", p, s, c, b)
            if "downsample_conv" in p:
                fold(f"{blk}/downsample", p, s, "downsample_conv", "downsample_bn")
    return out


# ---------------------------------------------------------------- quantization


def quantize_weights_per_channel(w: np.ndarray):
    """Symmetric per-output-channel int8: returns (w_int8, scale[co] f32)."""
    absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = np.maximum(absmax, 1e-12) / 127.0
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return w_q, scale.astype(np.float32)


def quantize_folded(folded: Dict, act_scales: Dict[str, float]) -> Dict:
    """Assemble the serving-side parameter tree: per conv —
    {w: int8 kernel, s: f32 [co] weight scales, b: f32 bias,
     a: f32 scalar input scale (from calibration)}."""
    q = {}
    for name, e in folded.items():
        w_q, s = quantize_weights_per_channel(e["w"])
        q[name] = {
            "w": jnp.asarray(w_q),
            "s": jnp.asarray(s),
            "b": jnp.asarray(e["b"]),
            "a": jnp.float32(act_scales[name]),
        }
    return q


# -------------------------------------------------------------------- forwards


def _conv_f32(x, w, b, stride=1, padding=None):
    y = lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride),
        padding if padding is not None else "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _resnet_structure():
    """Yield (name, stride, padding) for every conv in forward order, with
    block boundaries expressed by the caller's loop (mirrors resnet.py)."""
    for i, n_blocks in enumerate(STAGE_SIZES):
        for j in range(n_blocks):
            yield i, j, (2 if i > 0 and j == 0 else 1)


def folded_resnet50_forward(folded: Dict, x, observer=None,
                            compute_dtype=jnp.float32, pallas_l1=None,
                            pallas_stem=None, pallas_stages=None):
    """Forward over the FOLDED params — numerically equal (eval mode) to
    ResNet50.apply at compute_dtype=f32. `observer(name, x)` is called with
    each conv's input (the calibration hook).

    compute_dtype=bf16 is the folded SERVING mode: activations and weights
    ride bf16 END-TO-END — the MXU still accumulates f32 internally, but
    conv outputs, bias adds, relus and residuals all materialize in bf16,
    matching the flax bf16 graph's numeric contract. (Round 4 shipped this
    path with preferred_element_type=f32 + f32 bias adds, which forced an
    f32 materialization of every conv output between conv and activation:
    measured 3,888 vs 4,312 fps plain-bf16 e2e — the 10% loss PERF.md
    round 4c attributes to exactly this. The Pallas kernels keep their own
    f32-accumulate-then-round contract; their tests compare against an f32
    oracle with a bf16 envelope, not bit-exactly against this path.) `pallas_l1` (a
    pack_layer1_weights tuple) replaces the three layer1 bottleneck blocks
    with the fused VMEM-resident Pallas kernel; `pallas_stem` (a
    pack_stem_weights pair) replaces conv1+relu+maxpool with the fused
    space-to-depth stem kernel; `pallas_stages` ({stage_num:
    pack_stage_weights tuple}) replaces whole bottleneck stages with the
    parametric fused kernel (bandwidth-bound stages, see pallas_block.py).
    All only valid with 224x224 inputs (56x56 layer1 maps)."""
    cd = compute_dtype
    stages = dict(pallas_stages or {})
    if pallas_l1 is not None and 1 not in stages:
        stages[1] = None  # sentinel: use the hand-written layer1 kernel

    def conv(name, x, stride=1, padding=None):
        if observer is not None:
            observer(name, x)
        e = folded[name]
        if cd == jnp.float32:
            return _conv_f32(x, e["w"], e["b"], stride, padding)
        y = lax.conv_general_dilated(
            x.astype(cd), jnp.asarray(e["w"], cd), (stride, stride),
            padding if padding is not None else "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=cd,
        )
        return y + jnp.asarray(e["b"], cd)

    if pallas_stem is not None:
        from .pallas_block import fused_stem

        x = fused_stem(x.astype(cd), pallas_stem, dtype=cd)
    else:
        x = conv("conv1", x, 2, [(3, 3), (3, 3)])
        x = jax.nn.relu(x).astype(cd)
        x = nn_max_pool(x)
    structure = list(_resnet_structure())
    for i, j, stride in structure:
        stage_num = i + 1
        if stage_num in stages:
            if j > 0:
                continue  # whole stage already ran as one kernel
            if stages[stage_num] is None:  # pallas_l1 compat sentinel
                from .pallas_block import fused_layer1

                x = fused_layer1(x, pallas_l1, dtype=cd)
            else:
                from .pallas_block import fused_stage

                x = fused_stage(x, stages[stage_num], stage=stage_num,
                                dtype=cd)
            continue
        blk = f"layer{stage_num}_{j}"
        r = x
        y = jax.nn.relu(conv(f"{blk}/conv1", x)).astype(cd)
        y = jax.nn.relu(conv(f"{blk}/conv2", y, stride, [(1, 1), (1, 1)])).astype(cd)
        y = conv(f"{blk}/conv3", y)
        if f"{blk}/downsample" in folded:
            r = conv(f"{blk}/downsample", r, stride)
        x = jax.nn.relu(y + r).astype(cd)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def int8_resnet50_forward(q: Dict, x, compute_dtype=jnp.float32):
    """The int8 serving forward: every conv runs s8 x s8 -> s32 on the MXU;
    requantize/relu/residual ride the VPU in compute_dtype.

    int8-RESIDENT design (measured on v5e, scripts/probe_int8_variants.py,
    batch 128): block activations live ONLY as int8 — each epilogue
    requantizes straight to the next consumer's calibrated scale, and the
    identity-residual add uses the dequantized int8 tensor. That halves the
    materialized activation bytes vs keeping a float copy at every block
    boundary and cut the tower from 7.10 ms (float-resident) to 5.89 ms
    (1.49x the 8.78 ms bf16 tower). The residual dequantization adds ~0.3%
    relative output drift vs the float-resident int8 forward; the
    system-level gate is scripts/eval_e2e.py --int8-backbone on trained
    checkpoints. Epilogue math runs in compute_dtype (bf16 in serving —
    f32 epilogues measured 1.2 ms slower)."""
    cd = compute_dtype

    def conv_s32(xq, e, stride=1, padding=None):
        return lax.conv_general_dilated(
            xq, e["w"], (stride, stride),
            padding if padding is not None else "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def quant(x, a):
        return jnp.clip(jnp.round(x.astype(cd) * (1.0 / a).astype(cd)),
                        -127, 127).astype(jnp.int8)

    def deq(y, e, a_in):
        return (y.astype(cd) * (a_in * e["s"]).astype(cd)
                + e["b"].astype(cd))

    e1 = q["conv1"]
    xq = quant(x, e1["a"])
    y = jax.nn.relu(deq(conv_s32(xq, e1, 2, [(3, 3), (3, 3)]), e1, e1["a"]))
    xf = nn_max_pool(y)
    blocks = list(_resnet_structure())
    a_in = q["layer1_0/conv1"]["a"]
    xq = quant(xf, a_in)
    for idx, (i, j, stride) in enumerate(blocks):
        blk = f"layer{i + 1}_{j}"
        c1, c2, c3 = q[f"{blk}/conv1"], q[f"{blk}/conv2"], q[f"{blk}/conv3"]
        y = jax.nn.relu(deq(conv_s32(xq, c1), c1, a_in))
        yq = quant(y, c2["a"])
        y = jax.nn.relu(deq(conv_s32(yq, c2, stride, [(1, 1), (1, 1)]),
                            c2, c2["a"]))
        yq = quant(y, c3["a"])
        y = deq(conv_s32(yq, c3), c3, c3["a"])
        if f"{blk}/downsample" in q:
            # shares xq with conv1, so the dequant scale is a_in (the scale
            # xq was actually quantized with), not the entry's own "a"
            ed = q[f"{blk}/downsample"]
            r = deq(conv_s32(xq, ed, stride), ed, a_in)
        else:
            r = xq.astype(cd) * a_in.astype(cd)  # dequantized residual
        xf = jax.nn.relu(y + r)
        if idx + 1 < len(blocks):
            ni, nj, _ = blocks[idx + 1]
            a_in = q[f"layer{ni + 1}_{nj}/conv1"]["a"]
            xq = quant(xf, a_in)
    return jnp.mean(xf.astype(jnp.float32), axis=(1, 2)).astype(cd)


def nn_max_pool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


# ------------------------------------------------------------------ calibration


def calibrate_act_scales(folded: Dict, batches, percentile: float | None = None):
    """Run the folded float forward over `batches` (iterable of [B,H,W,C])
    recording each conv input's abs-max; returns {name: scalar scale}.
    With `percentile`, uses that percentile of |x| instead of the max
    (clipping large outliers often helps post-ReLU tensors)."""
    maxes: Dict[str, float] = {}

    for xb in batches:
        vals: Dict[str, jax.Array] = {}

        def observer(name, x):
            vals[name] = (
                jnp.max(jnp.abs(x))
                if percentile is None
                else jnp.percentile(jnp.abs(x), percentile)
            )

        folded_resnet50_forward(folded, jnp.asarray(xb), observer=observer)
        for name, v in vals.items():
            fv = float(v)
            maxes[name] = max(maxes.get(name, 0.0), fv)
    return {name: max(v, 1e-12) / 127.0 for name, v in maxes.items()}


def quantize_resnet_from_variables(variables: Dict, calib_batches,
                                   percentile: float | None = None) -> Dict:
    """One-call PTQ: variables (a ResNet50 {'params','batch_stats'} subtree)
    + calibration batches -> the int8 serving tree for
    `int8_resnet50_forward`."""
    folded = fold_bn_resnet(variables["params"], variables["batch_stats"])
    scales = calibrate_act_scales(folded, calib_batches, percentile)
    return quantize_folded(folded, scales)
