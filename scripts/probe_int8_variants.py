#!/usr/bin/env python
"""Chase the ResNet50 int8 tower gap: 6.96 ms measured vs ~4.7 ms if every
conv hit the bare-conv 1.9x (scripts/profile_int8_stages.py).

Variants timed on the real chip (batch from argv, default 128):
  A  current int8 forward (ops/quant.py int8_resnet50_forward)
  B  int8-resident: block activations live ONLY as int8; the residual add
     uses the dequantized int8 tensor (numerics change — gated separately)
  C  A but epilogue math in bf16 instead of f32
  D  per-stage split: time each layer-stage of A vs bf16 to find which
     stages actually speed up

Run ONLY when no training owns the chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from probe_int8 import chained


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pose6d_tpu.models.resnet import ResNet50
    from pose6d_tpu.ops.quant import (
        STAGE_SIZES, _resnet_structure, int8_resnet50_forward, nn_max_pool,
        quantize_resnet_from_variables)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.uniform(-2, 2, (B, 224, 224, 3)), jnp.bfloat16)

    tower = ResNet50(dtype=jnp.bfloat16)
    tvars = tower.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    q = quantize_resnet_from_variables(
        {"params": tvars["params"], "batch_stats": tvars["batch_stats"]},
        [np.asarray(crops[:8], np.float32)])

    results = {}

    def report(name, ms):
        results[name] = round(ms, 3)
        print(json.dumps({name: results[name]}), flush=True)

    report("bf16_ms", chained(
        lambda v, x: tower.apply(v, x, train=False), (tvars, crops), n=30) * 1e3)

    # ---- A: current
    report("A_int8_f32epi_ms", chained(
        lambda q, x: int8_resnet50_forward(q, x, compute_dtype=jnp.bfloat16),
        (q, crops), n=30) * 1e3)

    # ---- C: bf16 epilogue (cast s32 straight to bf16)
    def conv_s32(xq, e, stride=1, padding=None):
        return lax.conv_general_dilated(
            xq, e["w"], (stride, stride),
            padding if padding is not None else "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def quant_in(x, a, dt=jnp.float32):
        return jnp.clip(jnp.round(x.astype(dt) * (1.0 / a).astype(dt)),
                        -127, 127).astype(jnp.int8)

    def fwd_bf16epi(q, x):
        def conv(name, x, stride=1, padding=None):
            e = q[name]
            xq = quant_in(x, e["a"], jnp.bfloat16)
            y = conv_s32(xq, e, stride, padding)
            return (y.astype(jnp.bfloat16)
                    * (e["a"] * e["s"]).astype(jnp.bfloat16)
                    + e["b"].astype(jnp.bfloat16))

        x = jax.nn.relu(conv("conv1", x, 2, [(3, 3), (3, 3)]))
        x = nn_max_pool(x)
        for i, j, stride in _resnet_structure():
            blk = f"layer{i + 1}_{j}"
            r = x
            y = jax.nn.relu(conv(f"{blk}/conv1", x))
            y = jax.nn.relu(conv(f"{blk}/conv2", y, stride, [(1, 1), (1, 1)]))
            y = conv(f"{blk}/conv3", y)
            if f"{blk}/downsample" in q:
                r = conv(f"{blk}/downsample", r, stride)
            x = jax.nn.relu(y + r)
        return jnp.mean(x, axis=(1, 2))

    report("C_int8_bf16epi_ms", chained(fwd_bf16epi, (q, crops), n=30) * 1e3)

    # ---- B: int8-resident (residual rides the quantized tensor)
    def fwd_resident(q, x):
        e1 = q["conv1"]
        xq = quant_in(x, e1["a"])
        y = jax.nn.relu(
            conv_s32(xq, e1, 2, [(3, 3), (3, 3)]).astype(jnp.float32)
            * (e1["a"] * e1["s"]) + e1["b"])
        xf = nn_max_pool(y)
        a_in = None  # scale of xq when int8-resident
        xq, a_in = quant_in(xf, q["layer1_0/conv1"]["a"]), q["layer1_0/conv1"]["a"]
        for i, j, stride in _resnet_structure():
            blk = f"layer{i + 1}_{j}"
            e1, e2, e3 = q[f"{blk}/conv1"], q[f"{blk}/conv2"], q[f"{blk}/conv3"]
            # conv1 epilogue quantizes straight to conv2's scale
            y = jax.nn.relu(conv_s32(xq, e1).astype(jnp.float32)
                            * (a_in * e1["s"]) + e1["b"])
            yq = quant_in(y, e2["a"])
            y = jax.nn.relu(
                conv_s32(yq, e2, stride, [(1, 1), (1, 1)]).astype(jnp.float32)
                * (e2["a"] * e2["s"]) + e2["b"])
            yq = quant_in(y, e3["a"])
            y = (conv_s32(yq, e3).astype(jnp.float32)
                 * (e3["a"] * e3["s"]) + e3["b"])
            if f"{blk}/downsample" in q:
                ed = q[f"{blk}/downsample"]
                r = (conv_s32(xq, ed, stride).astype(jnp.float32)
                     * (a_in * ed["s"]) + ed["b"])
            else:
                r = xq.astype(jnp.float32) * a_in  # dequantized residual
            xf = jax.nn.relu(y + r)
            # next consumer's scale
            nxt = None
            flat = list(_resnet_structure())
            idx = flat.index((i, j, stride))
            if idx + 1 < len(flat):
                ni, njj, _ = flat[idx + 1]
                nxt = q[f"layer{ni + 1}_{njj}/conv1"]["a"]
            if nxt is not None:
                xq, a_in = quant_in(xf, nxt), nxt
        return jnp.mean(xf, axis=(1, 2))

    report("B_int8_resident_ms", chained(fwd_resident, (q, crops), n=30) * 1e3)

    # numeric drift of B vs A on this batch (random weights — scale only)
    a_out = int8_resnet50_forward(q, crops, compute_dtype=jnp.float32)
    b_out = fwd_resident(q, crops)
    drift = float(jnp.max(jnp.abs(a_out - b_out))
                  / (jnp.max(jnp.abs(a_out)) + 1e-9))
    report("B_vs_A_rel_drift", drift)

    # ---- D: per-stage bf16 vs int8 (chained per stage-slice)
    # stage boundaries: stem+layer1 / layer2 / layer3 / layer4
    def stage_slices_bf16(v, x):
        # full apply already timed; approximate per-stage by running prefixes
        pass

    # prefix timing: run the int8 forward truncated after each stage
    def fwd_prefix(q, x, upto):
        e1 = q["conv1"]
        xq = quant_in(x, e1["a"])
        y = jax.nn.relu(
            conv_s32(xq, e1, 2, [(3, 3), (3, 3)]).astype(jnp.float32)
            * (e1["a"] * e1["s"]) + e1["b"])
        xf = nn_max_pool(y)
        for i, j, stride in _resnet_structure():
            if i >= upto:
                break
            blk = f"layer{i + 1}_{j}"
            e1b, e2, e3 = q[f"{blk}/conv1"], q[f"{blk}/conv2"], q[f"{blk}/conv3"]
            xq2 = quant_in(xf, e1b["a"])
            y = jax.nn.relu(conv_s32(xq2, e1b).astype(jnp.float32)
                            * (e1b["a"] * e1b["s"]) + e1b["b"])
            yq = quant_in(y, e2["a"])
            y = jax.nn.relu(
                conv_s32(yq, e2, stride, [(1, 1), (1, 1)]).astype(jnp.float32)
                * (e2["a"] * e2["s"]) + e2["b"])
            yq = quant_in(y, e3["a"])
            y = (conv_s32(yq, e3).astype(jnp.float32)
                 * (e3["a"] * e3["s"]) + e3["b"])
            if f"{blk}/downsample" in q:
                ed = q[f"{blk}/downsample"]
                r = (conv_s32(xq2, ed, stride).astype(jnp.float32)
                     * (ed["a"] * ed["s"]) + ed["b"])
            else:
                r = xf
            xf = jax.nn.relu(y + r)
        return jnp.mean(xf, axis=(1, 2))

    prev = 0.0
    for upto in (1, 2, 3, 4):
        t = chained(lambda q, x, u=upto: fwd_prefix(q, x, u),
                    (q, crops), n=30) * 1e3
        report(f"D_int8_prefix_stage{upto}_ms", t)
        report(f"D_int8_stage{upto}_delta_ms", t - prev)
        prev = t

    print(json.dumps(results))


if __name__ == "__main__" and not (len(sys.argv) > 1 and sys.argv[1] == "E"):
    main()


def variant_e():
    """E: int8-resident activations + bf16 epilogue math (run standalone)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pose6d_tpu.models.resnet import ResNet50
    from pose6d_tpu.ops.quant import (
        _resnet_structure, nn_max_pool, quantize_resnet_from_variables)

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.uniform(-2, 2, (B, 224, 224, 3)), jnp.bfloat16)
    tower = ResNet50(dtype=jnp.bfloat16)
    tvars = tower.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    q = quantize_resnet_from_variables(
        {"params": tvars["params"], "batch_stats": tvars["batch_stats"]},
        [np.asarray(crops[:8], np.float32)])

    bf = jnp.bfloat16

    def conv_s32(xq, e, stride=1, padding=None):
        return lax.conv_general_dilated(
            xq, e["w"], (stride, stride),
            padding if padding is not None else "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def quant(x, a):
        return jnp.clip(jnp.round(x.astype(bf) * (1.0 / a).astype(bf)),
                        -127, 127).astype(jnp.int8)

    def deq(y, e, a_in):
        return (y.astype(bf) * (a_in * e["s"]).astype(bf) + e["b"].astype(bf))

    def fwd_e(q, x):
        e1 = q["conv1"]
        xq = quant(x, e1["a"])
        y = jax.nn.relu(deq(conv_s32(xq, e1, 2, [(3, 3), (3, 3)]), e1, e1["a"]))
        xf = nn_max_pool(y)
        flat = list(_resnet_structure())
        a_in = q["layer1_0/conv1"]["a"]
        xq = quant(xf, a_in)
        for idx, (i, j, stride) in enumerate(flat):
            blk = f"layer{i + 1}_{j}"
            e1b, e2, e3 = q[f"{blk}/conv1"], q[f"{blk}/conv2"], q[f"{blk}/conv3"]
            y = jax.nn.relu(deq(conv_s32(xq, e1b), e1b, a_in))
            yq = quant(y, e2["a"])
            y = jax.nn.relu(deq(conv_s32(yq, e2, stride, [(1, 1), (1, 1)]),
                                e2, e2["a"]))
            yq = quant(y, e3["a"])
            y = deq(conv_s32(yq, e3), e3, e3["a"])
            if f"{blk}/downsample" in q:
                ed = q[f"{blk}/downsample"]
                r = deq(conv_s32(xq, ed, stride), ed, a_in)
            else:
                r = xq.astype(bf) * a_in.astype(bf)
            xf = jax.nn.relu(y + r)
            if idx + 1 < len(flat):
                ni, nj, _ = flat[idx + 1]
                a_in = q[f"layer{ni + 1}_{nj}/conv1"]["a"]
                xq = quant(xf, a_in)
        return jnp.mean(xf.astype(jnp.float32), axis=(1, 2))

    t = chained(fwd_e, (q, crops), n=30) * 1e3
    print(json.dumps({"E_int8_resident_bf16epi_ms": round(t, 3)}))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "E":
    variant_e()
