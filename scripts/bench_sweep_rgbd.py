#!/usr/bin/env python
"""rgbd flagship throughput sweep (chained-difference, real chip).

Round-2 left rgbd at 3,987.8 fps vs the 5,000 fps/chip target, tuned only at
rgb's batch size. Knobs swept here:
  - batch size (the dual-backbone stage shifts the sweet spot)
  - depth_crop_bf16: share the crop dtype with RGB so XLA can CSE the
    interpolation matrices (safe: only the normalized depth feeds the CNN)
  - stem_s2d: space-to-depth stems (exact 7x7/s2 equivalent) — the depth
    backbone's 1-channel conv1 is heavily MXU-padded; s2d trades it for a
    16-channel matmul-shaped stem

Run ONLY when no training owns the chip. Prints one JSON line at the end.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def build(batch_size, depth_crop_bf16=True, stem_s2d=False):
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8

    ycfg = YoloConfig(num_classes=13, dtype=jnp.bfloat16)
    yvars = YoloV8(ycfg).init(jax.random.key(0), jnp.zeros((1, 640, 640, 3)))
    pcfg = PoseNetConfig(variant="rgbd", img_size=224, dtype=jnp.bfloat16,
                         stem_s2d=stem_s2d)
    pose = PoseNet(pcfg)
    pvars = pose.init(
        jax.random.key(1), jnp.zeros((1, 224, 224, 3)),
        depth=jnp.zeros((1, 224, 224, 1)),
    )
    pipe = PosePipeline(
        PipelineConfig(variant="rgbd", det_size=640, conf_thresh=0.0,
                       compute_dtype=jnp.bfloat16,
                       depth_crop_bf16=depth_crop_bf16),
        ycfg, yvars, pvars, pcfg,
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch_size, 480, 640, 3), dtype=np.uint8)
    )
    K = jnp.asarray(
        np.tile(np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                         np.float32), (batch_size, 1, 1))
    )
    return pipe, frames, K


def measure(pipe, frames, K, chain=100):
    from bench import _timed_chain

    t1 = _timed_chain(pipe, frames, K, 1)
    tn = _timed_chain(pipe, frames, K, 1 + chain)
    dt = tn - t1
    if dt <= 0.05:
        return float("nan")
    return frames.shape[0] * chain / dt


def main():
    results = {}
    cases = []
    for b in (64, 128, 192, 256):
        cases.append((f"b{b}_bf16crop", dict(batch_size=b)))
    cases.append(("b128_f32crop", dict(batch_size=128, depth_crop_bf16=False)))
    cases.append(("b128_s2d", dict(batch_size=128, stem_s2d=True)))
    cases.append(("b256_s2d", dict(batch_size=256, stem_s2d=True)))
    only = sys.argv[1:] or None
    for name, kw in cases:
        if only and name not in only:
            continue
        pipe, frames, K = build(**kw)
        fps = measure(pipe, frames, K)
        results[name] = round(fps, 1)
        print(f"{name}: {fps:.1f} fps", file=sys.stderr, flush=True)
        del pipe, frames, K
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
