"""Resident-frame gather for the device-side training pipeline.

The device-resident trainer keeps the whole decoded split in HBM as uint8
RGB [N, H, W, 3] / uint16 depth-mm [N, H, W] and gathers each step's batch
by index inside the epoch `lax.scan` (train/loop.expand_device_batch).
`jnp.take` on those buffers is the wrong tool on TPU: XLA lowers the
narrow-dtype gather catastrophically (measured ~300 ms/step for batch 32
from 256 resident frames on v5e — 100x the cost of the crop matmuls that
CONSUME the gathered frames, and >1000x the ~30 MB of traffic the gather
actually needs to move; see PERF.md round 3).

TPU-native formulation instead:
  1. Bitcast each frame to a flat row of uint32 words (kills the 8/16-bit
     (32, 128)-tile padding problem; 4x fewer elements).
  2. Gather rows with a Pallas kernel whose BlockSpec `index_map` reads the
     batch indices from scalar-prefetch memory — the pipeline then DMAs
     exactly the B requested frames HBM -> VMEM -> HBM and nothing else.
     (A one-hot matmul gather would be MXU-friendly but reads ALL N
     resident frames per step: ~3 GB/step at the parity run's N=3,360.)

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


def _gather_rows_kernel(idx_ref, src_ref, out_ref):
    # src block is the [1, R] row selected by index_map; copy it out.
    del idx_ref
    out_ref[...] = src_ref[...]


@partial(jax.jit, static_argnames=("interpret",))
def _gather_rows_u32(src: jax.Array, idx: jax.Array, *, interpret: bool):
    """src [N, R] uint32, idx [B] int32 -> [B, R] uint32 == src[idx]."""
    _, r = src.shape
    b = idx.shape[0]
    return pl.pallas_call(
        _gather_rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, r), lambda i, idx_ref: (idx_ref[i], 0))],
            out_specs=pl.BlockSpec((1, r), lambda i, idx_ref: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, r), jnp.uint32),
        interpret=interpret,
    )(idx.astype(jnp.int32), src)


def gather_frames(src: jax.Array, idx: jax.Array) -> jax.Array:
    """`src[idx]` for device-resident frame buffers, TPU-efficiently.

    src: [N, ...] uint8/uint16/uint32 with contiguous trailing dims;
    idx: [B] integer. Returns [B, ...] with src's dtype, bit-exact with
    `jnp.take(src, idx, axis=0)`.
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
