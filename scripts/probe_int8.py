#!/usr/bin/env python
"""Feasibility probe: does XLA:TPU reach the int8 MXU path from JAX?

v5e advertises 2x int8 throughput over bf16 (394 vs 197 TOPS). If
s8 x s8 -> s32 convolutions/matmuls actually hit that path from
`lax.conv_general_dilated` / `jnp.dot` with preferred_element_type=int32,
an opt-in post-training-quantized serving mode can lift the rgbd flagship
past its measured bf16 conv ceiling (PERF.md: 4,685 fps zero-overhead).
This probe times representative shapes both ways BEFORE any quantization
subsystem is built. Run ONLY when no training owns the chip.

Prints one JSON line per shape: {name, bf16_ms, int8_ms, speedup}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def chained(fn, args, n=100):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(a, n_iters):
        def body(i, carry):
            out = fn(*jax.tree.map(
                lambda x: (x + carry.astype(x.dtype)
                           if jnp.issubdtype(x.dtype, jnp.floating)
                           else jnp.bitwise_xor(x, carry.astype(x.dtype))
                           if jnp.issubdtype(x.dtype, jnp.integer)
                           else x),
                a,
            ))
            leaf = jax.tree.leaves(out)[0]
            return (jnp.sum(leaf.astype(jnp.float32)) > -1e30).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n_iters, body, jnp.uint8(0))

    def timed(k):
        _ = np.asarray(run_n(args, k))
        t0 = time.perf_counter()
        _ = np.asarray(run_n(args, k))
        return time.perf_counter() - t0

    t1 = timed(1)
    tn = timed(1 + n)
    return max(tn - t1, 1e-9) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    B = 128

    def conv(x, w, stride=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(
                jnp.int32 if x.dtype == jnp.int8 else jnp.float32
            ),
        )

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jnp.asarray(
                rng.integers(-127, 127, size=shape, dtype=np.int8))
        return jnp.asarray(rng.uniform(-1, 1, shape), dtype)

    cases = [
        # ResNet50 hot shapes (stage 3/4 bodies carry most FLOPs)
        ("conv3x3_c256_s28", lambda d: (mk((B, 28, 28, 256), d),
                                        mk((3, 3, 256, 256), d)),
         lambda x, w: conv(x, w)),
        ("conv3x3_c512_s14", lambda d: (mk((B, 14, 14, 512), d),
                                        mk((3, 3, 512, 512), d)),
         lambda x, w: conv(x, w)),
        ("conv1x1_c1024_s14", lambda d: (mk((B, 14, 14, 1024), d),
                                         mk((1, 1, 1024, 256), d)),
         lambda x, w: conv(x, w)),
        # head matmul
        ("dense_2048x2048", lambda d: (mk((B, 2048), d), mk((2048, 2048), d)),
         lambda x, w: jnp.dot(x, w, preferred_element_type=(
             jnp.int32 if x.dtype == jnp.int8 else jnp.float32))),
    ]

    results = {}
    for name, make, fn in cases:
        out = {}
        for dname, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
            try:
                out[dname] = chained(fn, make(dtype)) * 1e3
            except Exception as e:  # backend may reject int8 convs outright
                out[dname] = None
                out[dname + "_error"] = repr(e)[:200]
        if out.get("bf16") and out.get("int8"):
            out["speedup"] = round(out["bf16"] / out["int8"], 3)
        results[name] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in out.items()
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
