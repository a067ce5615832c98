#!/usr/bin/env python
"""Stage timing for the int8 serving path vs bf16 (chained difference).

The composed int8 pipeline gained 17% e2e (4,218 -> 5,046 fps) while bare
int8 convs measure 1.92-1.99x bf16 — this profiler attributes the gap:
times each tower and the detector standalone in both modes, plus the
activation-quantize step alone. Run ONLY when no training owns the chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from probe_int8 import chained  # same chained-difference helper


def main():
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.models.resnet import ResNet50
    from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8
    from pose6d_tpu.models.yolo.quant import (
        quantize_yolo_from_variables, yolo_int8_forward)
    from pose6d_tpu.ops.quant import (
        int8_resnet50_forward, quantize_resnet_from_variables)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.uniform(-2, 2, (B, 224, 224, 3)), jnp.bfloat16)
    frames = jnp.asarray(rng.uniform(0, 1, (B, 480, 640, 3)), jnp.bfloat16)

    results = {}

    def report(name, ms):
        results[name] = round(ms, 3)
        print(json.dumps({name: results[name]}), flush=True)

    # ---- ResNet50 tower
    tower = ResNet50(dtype=jnp.bfloat16)
    tvars = tower.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    report("tower_bf16_ms", chained(
        lambda v, x: tower.apply(v, x, train=False), (tvars, crops), n=30) * 1e3)

    q = quantize_resnet_from_variables(
        {"params": tvars["params"], "batch_stats": tvars["batch_stats"]},
        [np.asarray(crops[:8], np.float32)])
    report("tower_int8_ms", chained(
        lambda q, x: int8_resnet50_forward(q, x, compute_dtype=jnp.bfloat16),
        (q, crops), n=30) * 1e3)

    # the quantize step alone (round/clip/cast of the crop batch)
    report("act_quantize_ms", chained(
        lambda x: jnp.clip(jnp.round(x.astype(jnp.float32) * 8.0),
                           -127, 127).astype(jnp.int8),
        (crops,), n=50) * 1e3)

    # ---- YOLO
    ycfg = YoloConfig(num_classes=13, dtype=jnp.bfloat16)
    yolo = YoloV8(ycfg)
    yvars = yolo.init(jax.random.key(1), jnp.zeros((1, 640, 640, 3)))
    report("yolo_bf16_ms", chained(
        lambda v, x: yolo.apply(v, x, train=False), (yvars, frames), n=30) * 1e3)

    qy = quantize_yolo_from_variables(
        {"params": yvars["params"], "batch_stats": yvars["batch_stats"]},
        ycfg, [np.asarray(frames[:4], np.float32)])
    report("yolo_int8_ms", chained(
        lambda q, x: yolo_int8_forward(q, ycfg, x, compute_dtype=jnp.bfloat16),
        (qy, frames), n=30) * 1e3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
