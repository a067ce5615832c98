"""Benchmark harness: end-to-end frames/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target (BASELINE.md): >= 5000 frames/sec/chip end-to-end
detect -> crop -> pose. Until the YOLO detector lands, this measures the
crop -> preprocess -> pose-net stage (the pose half of the pipeline) in
bfloat16 as one jitted graph on device; vs_baseline is value / 5000.
"""

import json
import time

import numpy as np

BASELINE_FPS = 5000.0


def bench_pose_pipeline(batch_size=128, iters=30, warmup=5):
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.ops.augment import eval_preprocess
    from pose6d_tpu.ops.crop_resize import crop_params_from_bbox, crop_resize_bilinear

    cfg = PoseNetConfig(variant="rgb", img_size=224, dtype=jnp.bfloat16)
    model = PoseNet(cfg)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch_size, 480, 640, 3), dtype=np.uint8)
    )
    bboxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(50, 400, batch_size),
                rng.uniform(50, 300, batch_size),
                rng.uniform(80, 200, batch_size),
                rng.uniform(80, 160, batch_size),
            ],
            axis=-1,
        ).astype(np.float32)
    )

    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def pipeline(variables, frames, bboxes):
        x1, y1, size = crop_params_from_bbox(bboxes)
        crops = crop_resize_bilinear(frames, x1, y1, size, 224) / 255.0
        crops = eval_preprocess(crops).astype(jnp.bfloat16)
        rot, trans = model.apply(variables, crops)
        return rot.astype(jnp.float32), trans.astype(jnp.float32)

    # warmup / compile
    for _ in range(warmup):
        rot, trans = pipeline(variables, frames, bboxes)
    jax.block_until_ready((rot, trans))

    t0 = time.perf_counter()
    for _ in range(iters):
        rot, trans = pipeline(variables, frames, bboxes)
    jax.block_until_ready((rot, trans))
    dt = time.perf_counter() - t0

    fps = batch_size * iters / dt
    return fps


def main():
    fps = bench_pose_pipeline()
    print(
        json.dumps(
            {
                "metric": "crop_pose_frames_per_sec",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
