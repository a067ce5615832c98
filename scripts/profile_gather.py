#!/usr/bin/env python
"""Decompose the device-resident training preprocessing wall.

profile_train_step.py's no-model bracket measured ~303 ms/step for
gather+crop+augment alone (batch 32, 256 resident 480x640 frames) — 100x
the inference pipeline's crop cost. This times each candidate in isolation
(chained inside one jit, perturbed indices so nothing hoists):

  take_u8      jnp.take on the uint8 resident buffer (the current path)
  take_u16     jnp.take on the uint16 depth buffer
  onehot_bf16  one-hot [B,N] bf16 matmul gather (exact for uint8 values)
  onehot_f32   one-hot [B,N] f32 matmul gather (exact for uint16 values)
  crop_f32     crop_resize_matmul f32 on pre-gathered frames
  augment      train_augment on pre-cropped 224px batch

Run ONLY when no training owns the chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def chained(fn, n=30):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n_iters):
        def body(i, carry):
            out = fn(carry)
            leaf = jax.tree.leaves(out)[0]
            return (jnp.sum(leaf.astype(jnp.float32)) > -1e30).astype(jnp.int32)

        return jax.lax.fori_loop(0, n_iters, body, jnp.int32(0))

    def timed(k):
        _ = np.asarray(run_n(k))
        t0 = time.perf_counter()
        _ = np.asarray(run_n(k))
        return time.perf_counter() - t0

    t1 = timed(1)
    tn = timed(1 + n)
    return max(tn - t1, 1e-9) / n


def main():
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.ops.augment import AugmentConfig, train_augment
    from pose6d_tpu.ops.crop_resize import crop_resize_matmul

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    H, W, S = 480, 640, 224

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 255, (N, H, W, 3), np.uint8))
    depth = jax.device_put(rng.integers(300, 1500, (N, H, W), np.uint16))
    idx0 = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    x1 = jnp.asarray(rng.uniform(0, 200, B).astype(np.float32))
    y1 = jnp.asarray(rng.uniform(0, 150, B).astype(np.float32))
    size = jnp.asarray(rng.uniform(120, 260, B).astype(np.float32))
    crops = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    gathered = jnp.asarray(
        rng.integers(0, 255, (B, H, W, 3)).astype(np.float32))
    key = jax.random.key(0)

    res = {}

    def vary(c):
        return (idx0 + c) % N

    res["take_u8"] = chained(
        lambda c: jnp.take(frames, vary(c), axis=0).astype(jnp.float32))
    res["take_u16"] = chained(
        lambda c: jnp.take(depth, vary(c), axis=0).astype(jnp.float32))

    def onehot_gather(src, n_ch, dt):
        def f(c):
            oh = jax.nn.one_hot(vary(c), N, dtype=dt)
            flat = src.reshape(N, -1).astype(dt)
            return (oh @ flat).reshape(B, H, W, n_ch).astype(jnp.float32)
        return f

    res["onehot_bf16_u8"] = chained(onehot_gather(frames, 3, jnp.bfloat16))
    res["onehot_f32_u16"] = chained(onehot_gather(depth[..., None], 1,
                                                  jnp.float32))

    res["crop_f32"] = chained(
        lambda c: crop_resize_matmul(
            gathered + c.astype(jnp.float32), x1, y1, size, S) / 255.0)
    res["augment"] = chained(
        lambda c: train_augment(
            jax.random.fold_in(key, c), crops + c.astype(jnp.float32),
            AugmentConfig()))

    for k, v in res.items():
        print(f"{k:<16} {v * 1e3:8.2f} ms/step", file=sys.stderr)
    print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
