#!/usr/bin/env python
"""On-chip A/B of the train step: f32 vs bf16 compute (PERF.md round 3).

The device-resident rgbd train epoch measures ~385 ms/step in f32 on v5e
(epoch-timing instrumentation). This script times the SAME whole-epoch
lax.scan the trainer dispatches (make_train_epoch + expand_device_batch)
on synthetic resident frames, for f32 vs bf16 compute, by chained
difference: time(epoch of N steps) - time(epoch of 1 step) cancels
dispatch/fetch/compile. Run ONLY when no training owns the chip.

  python scripts/profile_train_step.py [variant] [n_frames] [n_steps]
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def epoch_meta_synth(n_steps, B, n_frames, img_wh=(640, 480), img_size=224,
                     seed=0):
    rng = np.random.default_rng(seed)
    W, H = img_wh
    n = n_steps * B
    x = rng.uniform(0, W - 200, n)
    y = rng.uniform(0, H - 200, n)
    w = rng.uniform(60, 180, n)
    h = rng.uniform(60, 180, n)
    from pose6d_tpu.data.device_pipeline import _vector_crop_params, _vector_adjust_K

    bbox = np.stack([x, y, w, h], axis=-1)
    p = _vector_crop_params(bbox, bbox, W, H, img_size)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    K = np.tile(np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                         np.float32), (n, 1, 1))
    meta = {
        "idx": rng.integers(0, n_frames, n).astype(np.int32),
        "x1": p["x1"], "y1": p["y1"], "size": p["size"],
        "quat": q.astype(np.float32),
        "trans": np.concatenate(
            [rng.normal(0, 0.05, (n, 2)), rng.uniform(0.5, 1.2, (n, 1))],
            axis=1).astype(np.float32),
        "obj_id": rng.integers(0, 6, n).astype(np.int32),
        "center_orig": p["center_orig"],
        "cam_K": K,
        "center_crop": p["center_crop"],
        "cam_K_crop": _vector_adjust_K(K, p),
    }
    return {k: v.reshape(n_steps, B, *v.shape[1:]) for k, v in meta.items()}


def main():
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.train.loop import (TrainConfig, create_train_state,
                                       make_train_epoch)

    variant = sys.argv[1] if len(sys.argv) > 1 else "rgbd"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    B = 32

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 255, (n_frames, 480, 640, 3), np.uint8))
    depth = (jax.device_put(
        rng.integers(300, 1500, (n_frames, 480, 640), np.uint16))
        if variant.startswith("rgbd") else None)

    report = {}

    # bracket the non-model cost: gather + crop matmuls + augment only
    import jax.numpy as jnp_
    from pose6d_tpu.train.loop import expand_device_batch
    from pose6d_tpu.ops.augment import AugmentConfig, train_augment

    def nomodel_epoch(frames_u8, depth_u16, meta_scan, keys):
        def body(carry, xs):
            meta, key = xs
            batch = expand_device_batch(frames_u8, depth_u16, meta, 224)
            rgb = train_augment(key, batch["rgb"], AugmentConfig())
            s = jnp_.sum(rgb.astype(jnp_.float32))
            if "depth" in batch:
                s = s + jnp_.sum(batch["depth"].astype(jnp_.float32))
            return carry + s, s

        return jax.lax.scan(body, jnp_.zeros(()), (meta_scan, keys))

    nomodel = jax.jit(nomodel_epoch)

    def run_nomodel(k):
        meta = {kk: jnp.asarray(v[:k]) for kk, v in
                epoch_meta_synth(n_steps, B, n_frames).items()}
        keys = jax.random.split(jax.random.key(1), k)
        t0 = time.perf_counter()
        _, per = nomodel(frames, depth, meta, keys)
        _ = np.asarray(per)
        return time.perf_counter() - t0

    run_nomodel(1); run_nomodel(n_steps)
    t1, tn = run_nomodel(1), run_nomodel(n_steps)
    ms0 = (tn - t1) / (n_steps - 1) * 1e3
    report["nomodel"] = {"ms_per_step": round(ms0, 1)}
    print(f"{variant} no-model (gather+crop+augment): {ms0:.1f} ms/step",
          file=sys.stderr)

    for dtype in ("float32", "bfloat16"):
        cfg = TrainConfig(variant=variant, compute_dtype=dtype)
        model, tx, state = create_train_state(cfg, jax.random.key(0))
        epoch_fn = make_train_epoch(model, tx, cfg)

        def run(k):
            meta = {kk: jnp.asarray(v[:k]) for kk, v in
                    epoch_meta_synth(n_steps, B, n_frames).items()}
            keys = jax.random.split(jax.random.key(1), k)
            nonlocal state
            t0 = time.perf_counter()
            state, losses = epoch_fn(state, frames, depth, meta, keys)
            _ = np.asarray(losses)  # force remote execution
            return time.perf_counter() - t0

        run(1)            # compile for k=1
        run(n_steps)      # compile for k=n_steps
        t1 = run(1)
        tn = run(n_steps)
        ms = (tn - t1) / (n_steps - 1) * 1e3
        report[dtype] = {
            "ms_per_step": round(ms, 1),
            "imgs_per_sec": round(B / (ms / 1e3), 1),
        }
        print(f"{variant} {dtype}: {ms:.1f} ms/step "
              f"({B / (ms / 1e3):.0f} img/s)", file=sys.stderr)

    f32, bf16 = report["float32"]["ms_per_step"], report["bfloat16"]["ms_per_step"]
    report["speedup"] = round(f32 / bf16, 2) if bf16 else None
    report["variant"] = variant
    print(json.dumps(report))


if __name__ == "__main__":
    main()
