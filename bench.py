"""Benchmark harness: end-to-end frames/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target (BASELINE.md): >= 5000 frames/sec/chip END-TO-END
detect -> crop -> pose. Measures the full unified pipeline
(pose6d_tpu.infer.PosePipeline): letterbox -> YOLOv8n forward -> NMS ->
best-box -> device crop+resize -> normalize -> PoseNet forward -> pinhole
correction, all one jitted graph, bf16 compute. Weights are random-init
(throughput is weight-independent).
"""

import json
import time

import numpy as np

BASELINE_FPS = 5000.0


def bench_e2e(batch_size=64, iters=20, warmup=4):
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8

    ycfg = YoloConfig(num_classes=13, dtype=jnp.bfloat16)
    yolo = YoloV8(ycfg)
    yvars = yolo.init(jax.random.key(0), jnp.zeros((1, 640, 640, 3)))

    pcfg = PoseNetConfig(variant="rgb", img_size=224, dtype=jnp.bfloat16)
    pose = PoseNet(pcfg)
    pvars = pose.init(jax.random.key(1), jnp.zeros((1, 224, 224, 3)))

    pipe = PosePipeline(
        PipelineConfig(variant="rgb", det_size=640, conf_thresh=0.0,
                       compute_dtype=jnp.bfloat16),
        ycfg, yvars, pvars, pcfg,
    )

    rng = np.random.default_rng(0)
    # a pool of DISTINCT device-resident input batches, cycled per
    # iteration: repeated identical executes can be deduped/cached by the
    # runtime, which inflates throughput unrealistically
    n_pool = 4
    pool = [
        jnp.asarray(rng.integers(0, 255, size=(batch_size, 480, 640, 3), dtype=np.uint8))
        for _ in range(n_pool)
    ]
    K = jnp.asarray(
        np.tile(
            np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32),
            (batch_size, 1, 1),
        )
    )

    outs = [pipe(pool[i % n_pool], K) for i in range(warmup)]
    jax.block_until_ready(outs)

    t0 = time.perf_counter()
    outs = [pipe(pool[i % n_pool], K) for i in range(iters)]
    # block on EVERY output: all iterations' compute must have completed
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    fps = bench_e2e()
    print(
        json.dumps(
            {
                "metric": "e2e_detect_crop_pose_frames_per_sec",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
