#!/usr/bin/env python
"""Per-stage timing of the inference pipeline + optional jax.profiler trace.

The reference has no profiling surface at all (SURVEY §5); this measures
each pipeline stage (YOLO forward, decode, NMS, crop, pose forward) and the
composed end-to-end graph on the current backend, and can emit a
jax.profiler trace for tensorboard.

Usage:
  python scripts/profile_pipeline.py [--batch 64] [--trace-dir /tmp/trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


_RTT = None


def _fetch(out):
    """Materialize one tiny leaf — on lazy remote backends this is the only
    thing that actually forces compile+execute."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf).ravel()[:1]


def _measure_rtt():
    """Baseline per-call dispatch+fetch cost of a trivial jit."""
    import jax
    import jax.numpy as jnp

    triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    _fetch(triv(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _fetch(triv(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def timed(name, f, *args, iters=10, variants=None):
    """Times f with a PER-CALL tiny fetch (lazy backends only execute what is
    materialized; block_until_ready is not sufficient), subtracting the
    measured trivial-call RTT baseline. Distinct inputs cycle so runtime
    dedup cannot skip executions."""
    global _RTT
    if _RTT is None:
        _RTT = _measure_rtt()
        print(f"{'rtt_baseline':>16}: {_RTT * 1e3:8.2f} ms")

    pools = variants or [args]
    out = f(*pools[0])
    _fetch(out)  # warm: compile + first execute
    reps = []
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            _fetch(f(*pools[i % len(pools)]))
        reps.append((time.perf_counter() - t0) / iters)
    dt = max(sorted(reps)[1] - _RTT, 0.0)
    print(f"{name:>16}: {dt * 1e3:8.2f} ms")
    return out, dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--bisect", action="store_true",
                    help="also time partial pipelines (detect-only, detect+crop)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.models.yolo.decode import batched_nms, decode_outputs
    from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8
    from pose6d_tpu.ops.crop_resize import crop_resize_matmul

    B = args.batch
    print(f"backend: {jax.default_backend()}, batch {B}")

    ycfg = YoloConfig(num_classes=13, dtype=jnp.bfloat16)
    yolo = YoloV8(ycfg)
    yvars = yolo.init(jax.random.key(0), jnp.zeros((1, 480, 640, 3)))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (B, 480, 640, 3), dtype=np.uint8))
    imgs = (frames.astype(jnp.bfloat16) / 255.0)

    imgs2 = (frames[:, ::-1].astype(jnp.bfloat16) / 255.0)
    f_yolo = jax.jit(lambda v, x: yolo.apply(v, x))
    outs, t_yolo = timed("yolo_fwd_480x640", f_yolo, yvars, imgs, iters=args.iters,
                         variants=[(yvars, imgs), (yvars, imgs2)])

    f_decode = jax.jit(lambda o: decode_outputs(o, ycfg, (480, 640)))
    (boxes, scores), t_dec = timed("decode", f_decode, outs, iters=args.iters)

    f_nms = jax.jit(lambda b, s: batched_nms(b, s, max_det=8, pre_topk=64, conf_thresh=0.0))
    _, t_nms = timed("nms_pre64", f_nms, boxes, scores, iters=args.iters)

    x1 = jnp.full((B,), 100.0)
    y1 = jnp.full((B,), 80.0)
    size = jnp.full((B,), 180.0)
    f_crop = jax.jit(
        lambda f_: crop_resize_matmul(
            f_.astype(jnp.bfloat16) / 255.0, x1, y1, size, 224, jnp.bfloat16
        )
    )
    _, t_crop = timed("crop_matmul_bf16", f_crop, frames, iters=args.iters)

    pcfg = PoseNetConfig(variant="rgb", img_size=224, dtype=jnp.bfloat16)
    pose = PoseNet(pcfg)
    pvars = pose.init(jax.random.key(1), jnp.zeros((1, 224, 224, 3)))
    crops = jnp.asarray(
        rng.uniform(-1, 1, (B, 224, 224, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    f_pose = jax.jit(lambda v, x: pose.apply(v, x))
    crops2 = crops[:, ::-1]
    _, t_pose = timed("posenet_fwd", f_pose, pvars, crops, iters=args.iters,
                      variants=[(pvars, crops), (pvars, crops2)])

    parts = t_yolo + t_dec + t_nms + t_crop + t_pose
    print(f"{'sum of parts':>16}: {parts * 1e3:8.2f} ms -> {B / parts:.0f} fps")

    pipe = PosePipeline(
        PipelineConfig(variant="rgb", conf_thresh=0.0), ycfg, yvars, pvars, pcfg
    )
    K = jnp.broadcast_to(jnp.asarray(np.array(
        [[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)), (B, 3, 3))

    frames2 = frames[:, ::-1]

    if args.bisect:
        # partial pipelines: where does the composition overhead live?
        from pose6d_tpu.ops.crop_resize import crop_params_from_bbox

        @jax.jit
        def conv_only(fr):
            return (fr.astype(jnp.bfloat16) / 255.0).sum()

        timed("uint8->bf16/255", conv_only, frames, iters=args.iters,
              variants=[(frames,), (frames2,)])

        @jax.jit
        def conv_yolo(yv, fr):
            fn = fr.astype(jnp.bfloat16) / 255.0
            outs = pipe.yolo.apply(yv, fn)
            return [o[0].sum() + o[1].sum() for o in outs]

        timed("conv+yolo", lambda f_: conv_yolo(yvars, f_),
              frames, iters=args.iters, variants=[(frames,), (frames2,)])

        @jax.jit
        def conv_yolo_decode(yv, fr):
            fn = fr.astype(jnp.bfloat16) / 255.0
            outs = pipe.yolo.apply(yv, fn)
            b, s = decode_outputs(outs, ycfg, (480, 640))
            return b.sum(), s.sum()

        timed("conv+yolo+decode", lambda f_: conv_yolo_decode(yvars, f_),
              frames, iters=args.iters, variants=[(frames,), (frames2,)])

        @jax.jit
        def detect_only(yv, fr):
            fn = fr.astype(jnp.bfloat16) / 255.0
            bbox, dets = pipe._detect_best(yv, fn)
            return bbox, dets["scores"]

        _, t_det = timed("e2e_detect_only", lambda f_: detect_only(yvars, f_),
                         frames, iters=args.iters, variants=[(frames,), (frames2,)])

        @jax.jit
        def detect_crop(yv, fr):
            fn = fr.astype(jnp.bfloat16) / 255.0
            bbox, dets = pipe._detect_best(yv, fn)
            b0 = bbox[:, 0]
            cx1, cy1, csize = crop_params_from_bbox(b0)
            crops = crop_resize_matmul(fn, cx1, cy1, csize, 224, jnp.bfloat16)
            return crops.sum()

        _, t_dc = timed("e2e_detect_crop", lambda f_: detect_crop(yvars, f_),
                        frames, iters=args.iters, variants=[(frames,), (frames2,)])

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    _, t_e2e = timed("e2e_pipeline", lambda f_: pipe(f_, K), frames, iters=args.iters,
                     variants=[(frames,), (frames2,)])
    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")
    print(f"{'e2e':>16}: {B / t_e2e:.0f} fps (overhead vs parts: "
          f"{(t_e2e - parts) * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
