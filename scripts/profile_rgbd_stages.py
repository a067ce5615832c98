#!/usr/bin/env python
"""Stage-by-stage device timing + MFU for the rgbd flagship pipeline.

Uses the same chained-difference method as bench.py (per-stage: N chained
executions inside one jit, time(N+1) - time(1)) so tunnel RTT and dispatch
cancel per stage. Each stage's analytic FLOP count turns the time into MFU
against the chip's bf16 peak. Run ONLY when no training owns the chip.

Prints one JSON line {stage: {ms_per_batch, gflops_per_frame, mfu_pct}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

PEAK_TFLOPS = float(os.environ.get("POSE6D_PEAK_TFLOPS", "197"))  # v5e bf16


def chained(fn, example, *extra, n=50):
    """Device seconds per execution of fn(example, *extra), via chained
    difference. `extra` (e.g. model variables) are jit ARGUMENTS — closing
    over 100 MB of params embeds them as literals and overflows the tunnel's
    compile-request body (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(x, extra_args, n_iters):
        def body(i, carry):
            out = fn(jax.tree.map(lambda a: a + carry.astype(a.dtype), x)
                     if isinstance(x, (tuple, list, dict)) else x + carry,
                     *extra_args)
            leaf = jax.tree.leaves(out)[0]
            return (jnp.sum(leaf.astype(jnp.float32)) > -1e30).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n_iters, body, jnp.uint8(0))

    def timed(n_iters):
        _ = np.asarray(run_n(example, extra, n_iters))  # warm compile
        t0 = time.perf_counter()
        _ = np.asarray(run_n(example, extra, n_iters))
        return time.perf_counter() - t0

    t1 = timed(1)
    tn = timed(1 + n)
    return max(tn - t1, 1e-9) / n


def main():
    import jax
    import jax.numpy as jnp

    from bench import _build_pipeline
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.models.yolo.decode import batched_nms, decode_outputs
    from pose6d_tpu.ops.crop_resize import crop_resize_matmul

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    pipe, frames, K = _build_pipeline(B, "rgbd")
    H, W = 480, 640
    S = 224

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.bfloat16)
    depth_f = jnp.asarray(rng.uniform(0.2, 1.5, (B, H, W, 1)), jnp.bfloat16)
    crops = jnp.asarray(rng.uniform(-2, 2, (B, S, S, 3)), jnp.bfloat16)
    dcrops = jnp.asarray(rng.uniform(0, 1, (B, S, S, 1)), jnp.bfloat16)
    x1 = jnp.full((B,), 100.0)
    y1 = jnp.full((B,), 80.0)
    size = jnp.full((B,), 180.0)

    # FLOP/frame estimates (2*MACs), computed from the architectures:
    #   ResNet50 @224x224x3: 4.09 GMACs -> 8.18 GF; 1-ch conv1 saves .16 GF
    #   YOLOv8n @640x640: 4.37 GMACs -> 8.7 GF; fully-conv => x(480/640)
    #   crop matmuls: ch*2*(S*H*W + S*W*S) per frame (rows then cols)
    crop_gf = 3 * 2 * (S * H * W + S * W * S) / 1e9
    dcrop_gf = crop_gf / 3
    flops = {
        "uint8_to_bf16": 0.0,
        "yolo_fwd": 8.7 * (H / 640.0),
        "decode_nms": 0.0,
        "rgb_crop": crop_gf,
        "depth_crop": dcrop_gf,
        "rgb_backbone_and_heads": 8.18,
        "depth_backbone": 8.02,
        "posenet_full": 8.18 + 8.02,
    }

    stages = {}

    stages["uint8_to_bf16"] = chained(
        lambda fr: fr.astype(jnp.bfloat16) / 255.0, frames)

    yv = pipe.yolo_variables
    stages["yolo_fwd"] = chained(lambda x, v: pipe.yolo.apply(v, x), imgs, yv)

    outs = jax.jit(lambda x, v: pipe.yolo.apply(v, x))(imgs, yv)

    def dec_nms(o):
        boxes, scores = decode_outputs(o, pipe.yolo_cfg, (H, W))
        return batched_nms(boxes, scores, max_det=8, pre_topk=64,
                           conf_thresh=0.0)

    stages["decode_nms"] = chained(dec_nms, outs)

    stages["rgb_crop"] = chained(
        lambda im: crop_resize_matmul(im, x1, y1, size, S, jnp.bfloat16), imgs)
    stages["depth_crop"] = chained(
        lambda im: crop_resize_matmul(im, x1, y1, size, S, jnp.bfloat16),
        depth_f)

    pv = pipe.pose_variables
    # BOTH inputs ride the perturbed example tree: closing depth over the
    # timing loop lets XLA hoist the (loop-invariant) depth tower out of the
    # fori_loop body, silently timing only the RGB tower (measured: 9.0 ms
    # "dual-tower" = the rgb tower alone; impossible 116% MFU).
    stages["posenet_full"] = chained(
        lambda cd, v: pipe.posenet.apply(v, cd["rgb"], depth=cd["d"]),
        {"rgb": crops, "d": dcrops}, pv)

    # isolate the two backbones: an rgb-variant PoseNet shares the rgb
    # backbone + equivalent head shapes; depth backbone = difference is
    # confounded by fusion, so also run the depth tower standalone
    rcfg = PoseNetConfig(variant="rgb", img_size=S, dtype=jnp.bfloat16)
    rnet = PoseNet(rcfg)
    rv = rnet.init(jax.random.key(2), jnp.zeros((1, S, S, 3)))
    stages["rgb_backbone_and_heads"] = chained(
        lambda c, v: rnet.apply(v, c), crops, rv)

    from pose6d_tpu.models.resnet import ResNet50

    dnet = ResNet50(dtype=jnp.bfloat16, in_channels=1)
    try:
        dv = dnet.init(jax.random.key(3), jnp.zeros((1, S, S, 1)))
        stages["depth_backbone"] = chained(
            lambda c, v: dnet.apply(v, c, train=False), dcrops, dv)
    except Exception as e:  # signature drift; report rather than die
        print(f"[profile] depth backbone standalone failed: {e}",
              file=sys.stderr)

    report = {}
    total_ms = 0.0
    for name, sec in stages.items():
        gf = flops.get(name, 0.0)
        mfu = (gf * B / sec) / (PEAK_TFLOPS * 1e3) * 100 if sec > 0 else 0.0
        report[name] = {
            "ms_per_batch": round(sec * 1e3, 3),
            "gflops_per_frame": round(gf, 2),
            "mfu_pct": round(mfu, 1),
        }
        if name not in ("rgb_backbone_and_heads", "depth_backbone"):
            total_ms += sec * 1e3
        print(f"{name:<24} {sec * 1e3:8.2f} ms/batch  "
              f"{gf:6.2f} GF/frame  MFU {mfu:5.1f}%", file=sys.stderr)
    report["_sum_ms"] = round(total_ms, 2)
    report["_sum_fps"] = round(B / (total_ms / 1e3), 1)
    report["_batch"] = B
    print(f"sum {total_ms:.2f} ms/batch -> {report['_sum_fps']} fps",
          file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
