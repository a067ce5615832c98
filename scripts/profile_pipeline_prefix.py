#!/usr/bin/env python
"""Cumulative-prefix profile of the COMPOSED inference pipeline.

profile_rgbd_stages.py times each stage in isolation (own jit, own inputs);
the composed graph measures ~3-4 ms/batch more than the sum of its stages
(PERF.md "ceiling" section). This harness runs chained-difference timings of
PREFIXES of PosePipeline._run_impl inside one jit — conversion, +detector,
+decode/NMS, +crop, +normalize, +posenet, full — so adjacent differences
expose where the composition overhead (layout moves between stages, fusion
breaks at the barrier, output casts) actually lives.

Usage: python scripts/profile_pipeline_prefix.py [batch] [variant]
Run ONLY when no training owns the chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

if os.environ.get("POSE6D_FORCE_CPU"):
    # the axon sitecustomize forces "axon,cpu"; config wins over env
    import jax

    jax.config.update("jax_platforms", "cpu")


def chained(fn, frames, K, depth, extra, n=50):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(fr, k, d, extra_args, n_iters):
        def body(i, carry):
            out = fn(fr + carry, k, d, *extra_args)
            # the carry must depend on EVERY output leaf: depending on just
            # the first leaf let XLA dead-code-eliminate the rest of the
            # graph inside the loop (the round-4g run measured full_run_impl
            # "faster" than its own +posenet prefix because _run_impl's first
            # leaf only needs the detector — crop+posenet were DCE'd)
            tot = sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree.leaves(out)
                if jnp.issubdtype(leaf.dtype, jnp.number) or leaf.dtype == jnp.bool_
            )
            return (tot > -1e30).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n_iters, body, jnp.uint8(0))

    def timed(n_iters):
        _ = np.asarray(run_n(frames, K, depth, extra, n_iters))
        t0 = time.perf_counter()
        _ = np.asarray(run_n(frames, K, depth, extra, n_iters))
        return time.perf_counter() - t0

    t1 = timed(1)
    tn = timed(1 + n)
    return max(tn - t1, 1e-9) / n


def main():
    import jax
    import jax.numpy as jnp

    from bench import _build_pipeline
    from pose6d_tpu.geometry.pinhole import adjust_intrinsics_for_crop, pinhole_xy_from_z
    from pose6d_tpu.ops.augment import eval_preprocess
    from pose6d_tpu.ops.crop_resize import crop_params_from_bbox, crop_resize_matmul
    from pose6d_tpu.data.crop import DEPTH_INVALID_M, DEPTH_MAX_M, DEPTH_MIN_M

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variant = sys.argv[2] if len(sys.argv) > 2 else "rgb"
    pipe, frames, K = _build_pipeline(B, variant)
    cfg = pipe.cfg
    S = cfg.img_size
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.2, 1.5, (B, 480, 640)), jnp.float32)
    # frames arrive uint8; perturbation must stay uint8-representable
    frames = jnp.asarray(np.asarray(frames), jnp.uint8)

    yv, pv = pipe.yolo_variables, pipe.pose_variables

    def convert(fr, k, d, yvars, pvars):
        return jax.lax.optimization_barrier(
            fr.astype(cfg.compute_dtype) / 255.0)

    def detect(fr, k, d, yvars, pvars):
        fn = convert(fr, k, d, yvars, pvars)
        return pipe.yolo.apply(yvars, fn)

    def decode(fr, k, d, yvars, pvars):
        fn = convert(fr, k, d, yvars, pvars)
        return pipe._detect_best(yvars, fn)

    def cropped(fr, k, d, yvars, pvars):
        fn = convert(fr, k, d, yvars, pvars)
        bbox, dets = pipe._detect_best(yvars, fn)
        bb = bbox[:, 0]
        cx1, cy1, csize = crop_params_from_bbox(bb)
        crops = crop_resize_matmul(fn, cx1, cy1, csize, S,
                                   compute_dtype=cfg.compute_dtype)
        return crops

    def normalized(fr, k, d, yvars, pvars):
        return eval_preprocess(
            cropped(fr, k, d, yvars, pvars)).astype(cfg.compute_dtype)

    def with_depth(fr, k, d, yvars, pvars):
        fn = convert(fr, k, d, yvars, pvars)
        bbox, dets = pipe._detect_best(yvars, fn)
        bb = bbox[:, 0]
        cx1, cy1, csize = crop_params_from_bbox(bb)
        crops = eval_preprocess(
            crop_resize_matmul(fn, cx1, cy1, csize, S,
                               compute_dtype=cfg.compute_dtype)
        ).astype(cfg.compute_dtype)
        ddt = cfg.compute_dtype if cfg.depth_crop_bf16 else jnp.float32
        dc = crop_resize_matmul(d[..., None].astype(ddt), cx1, cy1, csize, S,
                                compute_dtype=ddt)[..., 0]
        dn = jnp.clip((dc - DEPTH_MIN_M) / (DEPTH_MAX_M - DEPTH_MIN_M), 0, 1)
        dn = jnp.where(dc < DEPTH_INVALID_M, 0.0, dn)
        return crops, dn[..., None].astype(cfg.compute_dtype)

    def posed(fr, k, d, yvars, pvars):
        if variant == "rgbd":
            crops, dn = with_depth(fr, k, d, yvars, pvars)
            rot, trans = pipe.posenet.apply(pvars, crops, depth=dn)
        else:
            crops = normalized(fr, k, d, yvars, pvars)
            rot, trans = pipe.posenet.apply(pvars, crops)
        return rot

    def full(fr, k, d, yvars, pvars):
        return pipe._run_impl(yvars, pvars, fr, k, d, pipe._quantized,
                               pipe._folded)

    prefixes = [("convert", convert), ("+yolo", detect), ("+decode_nms", decode),
                ("+crop", cropped), ("+normalize", normalized)]
    if variant == "rgbd":
        prefixes.append(("+depth_crop", with_depth))
    prefixes += [("+posenet", posed), ("full_run_impl", full)]

    report = {}
    prev = 0.0
    for name, fn in prefixes:
        sec = chained(fn, frames, K, depth, (yv, pv))
        ms = sec * 1e3
        report[name] = {"cum_ms": round(ms, 2), "delta_ms": round(ms - prev, 2)}
        print(f"{name:<16} cum {ms:8.2f} ms/batch   delta {ms - prev:7.2f} ms",
              file=sys.stderr)
        prev = ms
    report["_batch"] = B
    report["_variant"] = variant
    report["_fps_full"] = round(B / (prev / 1e3), 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
