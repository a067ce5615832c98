#!/usr/bin/env python
"""Stage-by-stage device timing for the device-preprocess TRAIN path.

Round-3 finding: one-dispatch-per-epoch training still runs ~0.38 s/step on
the chip (83 img/s at batch 32) — the same wall the per-step dispatch RTT
used to impose, so the time is now going into the device program itself.
This script isolates the candidate stages with the chained-difference method
(see profile_rgbd_stages.py): uint8 frame gather, crop matmuls, augmentation,
f32 forward+backward, optimizer update, and the composed step.

Run ONLY when no training owns the chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def chained(fn, example, *extra, n=20):
    """Device seconds per execution via chained difference; `example` leaves
    are perturbed per iteration so nothing hoists out of the loop."""
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
        _ = np.asarray(run_n(example, extra, n_iters))
        t0 = time.perf_counter()
        _ = np.asarray(run_n(example, extra, n_iters))
        return time.perf_counter() - t0

    t1 = timed(1)
    tn = timed(1 + n)
    return max(tn - t1, 1e-9) / n


def main():
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.ops.augment import AugmentConfig, train_augment
    from pose6d_tpu.ops.crop_resize import crop_resize_matmul
    from pose6d_tpu.train.loop import (
        TrainConfig, create_train_state, make_train_step,
    )

    variant = sys.argv[1] if len(sys.argv) > 1 else "rgbd"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    N_FRAMES = 512  # resident-store stand-in; gather cost scales with row
    H, W, S = 480, 640, 224

    rng = np.random.default_rng(0)
    frames_u8 = jnp.asarray(
        rng.integers(0, 255, (N_FRAMES, H, W, 3), dtype=np.uint8))
    depth_u16 = jnp.asarray(
        rng.integers(0, 1500, (N_FRAMES, H, W), dtype=np.uint16))
    idx = jnp.asarray(rng.integers(0, N_FRAMES, (B,), dtype=np.int32))
    x1 = jnp.full((B,), 100.0)
    y1 = jnp.full((B,), 80.0)
    size = jnp.full((B,), 180.0)
    crops = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.float32)

    stages = {}

    # 1. the uint8 gather alone (suspect: emulated gather on (32,128)-tiled
    # uint8). idx is perturbed via the example tree (int add).
    stages["gather_u8"] = chained(
        lambda i, f: jnp.take(f, jnp.clip(i, 0, N_FRAMES - 1), axis=0),
        idx, frames_u8)
    stages["gather_u16"] = chained(
        lambda i, f: jnp.take(f, jnp.clip(i, 0, N_FRAMES - 1), axis=0),
        idx, depth_u16)

    # 2. gather + f32 crop matmuls (expand_device_batch's pixel half)
    def gather_crop(i, f):
        src = jnp.take(f, jnp.clip(i, 0, N_FRAMES - 1), axis=0).astype(jnp.float32)
        return crop_resize_matmul(src, x1, y1, size, S) / 255.0

    stages["gather_crop_rgb"] = chained(gather_crop, idx, frames_u8)

    # 3. augmentation on crops
    key = jax.random.key(0)
    stages["augment"] = chained(
        lambda c: train_augment(key, c, AugmentConfig()), crops)

    # 4. f32 fwd+bwd+adamw on pre-made crops (no preprocessing)
    cfg = TrainConfig(variant=variant, img_size=S, batch_size=B)
    model, tx, state = create_train_state(cfg, jax.random.key(1))
    step = make_train_step(model, tx, cfg)  # host-batch signature
    batch = {
        "rgb": crops,
        "quat": jnp.asarray(rng.normal(size=(B, 4)), jnp.float32),
        "trans": jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        "obj_id": jnp.zeros((B,), jnp.int32),
        "center_orig": jnp.zeros((B, 2), jnp.float32),
        "center_crop": jnp.zeros((B, 2), jnp.float32),
        "cam_K": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1)),
        "cam_K_crop": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1)),
        "valid": jnp.ones((B,), bool),
    }
    if variant.startswith("rgbd"):
        batch["depth"] = jnp.asarray(rng.uniform(0, 1, (B, S, S, 1)), jnp.float32)
        batch["depth_raw"] = jnp.asarray(rng.uniform(0.2, 1.5, (B, S, S)), jnp.float32)

    # make_train_step donates state; time it by re-running on a fresh state
    # copy each call (timing loop must not depend on donation): use the
    # chained trick on the BATCH while carrying state functionally inside.
    import jax.tree_util as jtu

    def fwd_bwd(b, st):
        new_state, metrics = step_nodonate(st, b, key)
        return metrics["loss"]

    from pose6d_tpu.train.loop import _make_core

    core = _make_core(model, tx, cfg)
    step_nodonate = lambda st, b, k: core(st, b, k)
    stages["fwd_bwd_adamw"] = chained(fwd_bwd, batch, state)

    report = {}
    for name, sec in stages.items():
        report[name] = round(sec * 1e3, 3)
        print(f"{name:<18} {sec * 1e3:9.3f} ms", file=sys.stderr)
    report["_batch"] = B
    report["_variant"] = variant
    print(json.dumps(report))


if __name__ == "__main__":
    main()
