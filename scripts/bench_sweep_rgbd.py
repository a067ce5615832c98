#!/usr/bin/env python
"""rgbd flagship throughput sweep on the real chip (VERDICT r2 #1).

The rgbd e2e number (4,183 fps at batch 128) sits 0.84x the 5,000 fps
target with both ResNet50 towers measured near conv speed-of-light
standalone. Remaining levers, each measured here by the chained-difference
method (see PERF.md "Measurement methodology"):

  - batch size: 128 was tuned for the rgb variant; the dual-tower pose
    stage shifts the compute/overhead balance, and larger N can lift conv
    MFU (better MXU tiling).
  - bf16 pre-cast parameters: the graph casts f32 params per invocation;
    pre-casting halves weight HBM traffic (2x ResNet50 = ~190 MB f32/step).
  - nms_pre_topk 32: fewer fixpoint-NMS candidates (one object per frame).

Run ONLY when no training owns the chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def measure(pipe, frames, K, chain=100):
    from bench import _timed_chain

    t1 = _timed_chain(pipe, frames, K, 1)
    tn = _timed_chain(pipe, frames, K, 1 + chain)
    dt = tn - t1
    if dt <= 0.05:
        return float("nan")
    return frames.shape[0] * chain / dt


def main():
    import jax.numpy as jnp
    import jax

    from bench import _build_pipeline
    from pose6d_tpu.infer import PipelineConfig, PosePipeline

    batches = [int(b) for b in (sys.argv[1:] or ["128", "192", "256"])]
    results = {}

    for B in batches:
        pipe, frames, K = _build_pipeline(B, variant="rgbd")
        fps = measure(pipe, frames, K, chain=max(40, 12800 // B))
        results[f"b{B}"] = round(fps, 1)
        print(f"rgbd b{B}: {fps:.1f} fps", file=sys.stderr)

    # knobs at the best batch so far
    bestB = max(batches, key=lambda b: results[f"b{b}"])
    pipe, frames, K = _build_pipeline(bestB, variant="rgbd")

    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        (pipe.yolo_variables, pipe.pose_variables),
    )
    pipe_bf16 = PosePipeline(pipe.cfg, pipe.yolo_cfg, bf16[0], bf16[1],
                             pipe.pose_cfg)
    results[f"b{bestB}_bf16params"] = round(measure(pipe_bf16, frames, K), 1)
    print(f"rgbd b{bestB} bf16 params: {results[f'b{bestB}_bf16params']} fps",
          file=sys.stderr)

    cfg32 = PipelineConfig(variant="rgbd", det_size=640, conf_thresh=0.0,
                           compute_dtype=jnp.bfloat16, nms_pre_topk=32)
    pipe32 = PosePipeline(cfg32, pipe.yolo_cfg, pipe.yolo_variables,
                          pipe.pose_variables, pipe.pose_cfg)
    results[f"b{bestB}_topk32"] = round(measure(pipe32, frames, K), 1)
    print(f"rgbd b{bestB} topk32: {results[f'b{bestB}_topk32']} fps",
          file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
