#!/usr/bin/env python
"""Bracket the device-preprocess (no-model) train cost stage by stage.

The round-3 no-model bracket (profile_train_step.py) measured ~305 ms/step
for gather+crop+augment at batch 32 — and swapping the uint8 jnp.take for
the Pallas scalar-prefetch gather did NOT move it, so the wall is NOT the
gather. This script times cumulative prefixes of expand_device_batch inside
the SAME whole-epoch lax.scan the trainer dispatches, by chained difference
(t(epoch of N steps) - t(epoch of 1 step)), isolating:

  gather            Pallas frame gather (u8 + u16) only
  gather_take       jnp.take baseline for comparison
  convert           + astype(f32) (+ /255, /1000)
  crop_rgb          + RGB crop+resize matmuls
  crop_depth        + depth crop + normalize
  augment           + train_augment (full expand_device_batch equivalent)

Run ONLY when no training owns the chip.
  python scripts/profile_nomodel.py [n_frames] [n_steps] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.data.crop import DEPTH_INVALID_M, DEPTH_MAX_M, DEPTH_MIN_M
    from pose6d_tpu.ops.augment import AugmentConfig, train_augment
    from pose6d_tpu.ops.crop_resize import crop_resize_matmul
    from pose6d_tpu.ops.gather_frames import gather_frames

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    S = 224

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 255, (n_frames, 480, 640, 3), np.uint8))
    depth = jax.device_put(rng.integers(300, 1500, (n_frames, 480, 640), np.uint16))

    def meta(k):
        return {
            "idx": jnp.asarray(
                rng.integers(0, n_frames, (k, B)).astype(np.int32)),
            "x1": jnp.asarray(rng.uniform(0, 300, (k, B)).astype(np.float32)),
            "y1": jnp.asarray(rng.uniform(0, 200, (k, B)).astype(np.float32)),
            "size": jnp.asarray(rng.uniform(80, 220, (k, B)).astype(np.float32)),
        }

    def stage_fn(stage):
        def body_out(frames, depth, m, key):
            out = []
            if stage == "gather_take":
                out.append(jnp.take(frames, m["idx"], axis=0))
                out.append(jnp.take(depth, m["idx"], axis=0))
            else:
                src8 = gather_frames(frames, m["idx"])
                src16 = gather_frames(depth, m["idx"])
                if stage == "gather":
                    out += [src8, src16]
                else:
                    src = src8.astype(jnp.float32)
                    raw_full = src16.astype(jnp.float32)
                    if stage == "convert":
                        out += [src / 255.0, raw_full / 1000.0]
                    else:
                        rgb = crop_resize_matmul(
                            src, m["x1"], m["y1"], m["size"], S) / 255.0
                        if stage == "crop_rgb":
                            out.append(rgb)
                        else:
                            raw = crop_resize_matmul(
                                raw_full[..., None], m["x1"], m["y1"], m["size"], S
                            )[..., 0] / 1000.0
                            d = jnp.clip(
                                (raw - DEPTH_MIN_M) / (DEPTH_MAX_M - DEPTH_MIN_M),
                                0.0, 1.0)
                            d = jnp.where(raw < DEPTH_INVALID_M, 0.0, d)
                            if stage == "crop_depth":
                                out += [rgb, d]
                            elif stage == "augment":
                                out += [train_augment(key, rgb, AugmentConfig()), d]
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

        def epoch(frames, depth, meta_scan, keys):
            # frames/depth are ARGUMENTS: closing over the 225 MB resident
            # buffer embeds it in the HLO (the remote compiler rejects the
            # request body outright — HTTP 413)
            def body(carry, xs):
                m, key = xs
                s = body_out(frames, depth, m, key)
                return carry + s, s

            return jax.lax.scan(body, jnp.zeros(()), (meta_scan, keys))

        return jax.jit(epoch)

    report = {}
    for stage in ("gather", "gather_take", "convert", "crop_rgb",
                  "crop_depth", "augment"):
        fn = stage_fn(stage)

        def run(k):
            ms = meta(k)
            keys = jax.random.split(jax.random.key(1), k)
            t0 = time.perf_counter()
            _, per = fn(frames, depth, ms, keys)
            _ = np.asarray(per)
            return time.perf_counter() - t0

        run(1); run(n_steps)  # compile both shapes
        t1, tn = run(1), run(n_steps)
        ms_step = (tn - t1) / (n_steps - 1) * 1e3
        report[stage] = round(ms_step, 2)
        print(f"{stage:<12} {ms_step:9.2f} ms/step", file=sys.stderr)

    report["_batch"] = B
    report["_n_frames"] = n_frames
    print(json.dumps(report))


if __name__ == "__main__":
    main()
