"""Resident-frame gather for the device-side training pipeline.

The device-resident trainer keeps the whole decoded split in HBM as uint8
RGB [N, H, W, 3] / uint16 depth-mm [N, H, W] and gathers each step's batch
by index inside the epoch `lax.scan` (train/loop.expand_device_batch).

History (PERF.md round 3): the first no-model bracket attributed the
~300 ms/step training wall to `jnp.take` on these buffers and this kernel
was written as the fix. The finer per-stage bracket
(scripts/profile_nomodel.py, real v5e) then REFUTED that: the take costs
~1 ms at batch 32 — the wall was the `jnp.choose` gather inside the
augmentation's HSV conversion. Measured on chip, `jnp.take` (0.96 ms) and
this kernel (1.62 ms) are both noise at step scale.

The Pallas formulation is kept as the dispatch path because its cost is
guaranteed by construction rather than by XLA's gather lowering mood:
  1. Bitcast each frame to a flat row of uint32 words (no 8/16-bit
     (32, 128)-tile padding; 4x fewer elements), shaped [R/128, 128]
     to satisfy Mosaic's (8, 128) block-tiling rule.
  2. Gather rows with a Pallas kernel whose BlockSpec `index_map` reads the
     batch indices from scalar-prefetch memory — the pipeline then DMAs
     exactly the B requested frames HBM -> VMEM -> HBM and nothing else,
     independent of N. (A one-hot matmul gather would read ALL N resident
     frames per step: ~3 GB/step at the parity run's N=3,360.)

Bit-exact vs `jnp.take` by construction (pure word moves, no arithmetic);
pinned by tests/test_gather_frames.py. Falls back to interpreter mode
off-TPU so the CPU mesh tests exercise the same code path.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8


def _gather_rows_kernel(idx_ref, src_ref, out_ref):
    # src block is the [1, R/128, 128] frame selected by index_map; copy it.
    del idx_ref
    out_ref[...] = src_ref[...]


@partial(jax.jit, static_argnames=("interpret",))
def _gather_rows_u32(src: jax.Array, idx: jax.Array, *, interpret: bool):
    """src [N, R] uint32 (R % 1024 == 0), idx [B] int32 -> src[idx].

    Mosaic requires the last two block dims to be (8k, 128m) (or match the
    array), so the flat word row is shaped [R/128, 128] and the kernel moves
    one whole frame (block rows = R/128, a multiple of 8) per grid step."""
    n, r = src.shape
    rows = r // _LANES
    src3 = src.reshape(n, rows, _LANES)
    b = idx.shape[0]
    out = pl.pallas_call(
        _gather_rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, rows, _LANES), lambda i, idx_ref: (idx_ref[i], 0, 0))
            ],
            out_specs=pl.BlockSpec((1, rows, _LANES), lambda i, idx_ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, _LANES), jnp.uint32),
        interpret=interpret,
    )(idx.astype(jnp.int32), src3)
    return out.reshape(b, r)


def gather_frames(src: jax.Array, idx: jax.Array) -> jax.Array:
    """`src[idx]` for device-resident frame buffers, TPU-efficiently.

    src: [N, ...] uint8/uint16/uint32 with contiguous trailing dims;
    idx: [B] integer. Returns [B, ...] with src's dtype, bit-exact with
    `jnp.take(src, idx, axis=0)`.

    NOTE: for narrow dtypes this bitcasts the FULL source to packed u32
    words inside the graph — XLA lowers that bitcast to a per-byte u32
    convert + copy of the whole buffer (measured: a hoisted 15.8 GB HLO
    temp for the 3,360-frame parity split -> compile-time HBM OOM). Use
    pack_frames_host + gather_frames_packed for large resident buffers;
    this entry point is for small/odd-geometry arrays and tests.
    """
    n = src.shape[0]
    frame_shape = src.shape[1:]
    itemsize = jnp.dtype(src.dtype).itemsize
    words_per_frame, rem = divmod(math.prod(frame_shape) * itemsize, 4)
    if rem != 0 or words_per_frame % _LANES != 0:
        # odd geometry (tiny fixtures): XLA's take handles it
        return jnp.take(src, idx, axis=0)
    pack = 4 // itemsize
    if pack == 1:
        flat = src.reshape(n, words_per_frame)
    else:
        flat = jax.lax.bitcast_convert_type(
            src.reshape(n, words_per_frame, pack), jnp.uint32)
    interpret = jax.default_backend() != "tpu"
    out = _gather_rows_u32(flat, idx, interpret=interpret)
    if pack > 1:
        out = jax.lax.bitcast_convert_type(out, src.dtype)  # [B, R, pack]
    return out.reshape((idx.shape[0],) + frame_shape)


def pack_frames_host(a) -> "object | None":
    """HOST-side zero-copy pack of a frame buffer [N, ...] (uint8/uint16)
    into u32 words [N, R] for gather_frames_packed, or None when the frame
    byte count doesn't divide into whole 128-lane word rows.

    The pack MUST happen on the host: inside the graph the equivalent
    `lax.bitcast_convert_type` materializes a 4x-expanded u32 copy of the
    ENTIRE resident buffer as a loop-hoisted temp (15.8 GB for the parity
    split — the round-3 compile-time OOM). A numpy `.view` is a free
    reinterpretation of the same bytes.
    """
    import numpy as np

    n = a.shape[0]
    flat = np.ascontiguousarray(a).reshape(n, -1)
    nbytes = flat.shape[1] * flat.dtype.itemsize
    words, rem = divmod(nbytes, 4)
    if rem != 0 or words % _LANES != 0:
        return None
    return flat.view(np.uint32)


def gather_frames_packed(
    words: jax.Array, idx: jax.Array, frame_shape: tuple, dtype
) -> jax.Array:
    """Gather from a host-packed word buffer: words [N, R] u32 (from
    pack_frames_host), returns [B, *frame_shape] in `dtype`. Bit-exact with
    `jnp.take(src, idx, axis=0)` on the original array (little-endian word
    packing both sides). Only the B gathered frames are ever bitcast back,
    so the unpack temp is batch-sized, not split-sized."""
    interpret = jax.default_backend() != "tpu"
    out = _gather_rows_u32(words, idx, interpret=interpret)  # [B, R]
    dtype = jnp.dtype(dtype)
    if dtype.itemsize != 4:
        out = jax.lax.bitcast_convert_type(out, dtype)  # [B, R, pack]
    return out.reshape((idx.shape[0],) + tuple(frame_shape))
