"""Fused ResNet50 layer1 as one Pallas kernel (bandwidth probe / serving path).

PERF.md's stage profile ends at "every conv graph sits at XLA's 59-60% bf16
conv MFU on v5e", with the remainder attributed to the bandwidth-bound
stem+layer1 (56x56 maps, C<=256). This module is the bounded probe of that
ceiling (VERDICT round 3, next-steps item 3b): XLA materializes every
bottleneck-block boundary of layer1 to HBM (~6 MB per block per image at
batch 128 in bf16, ~18 MB for the stage), while the whole stage's weights
are ~0.3 MB and the working set of ONE image fits VMEM many times over.

The kernel runs all three layer1 bottleneck blocks for one batch element
per grid step, keeping every intermediate VMEM-resident:

  x [56,56,64] -> block0 (1x1 64->64, 3x3 64->64, 1x1 64->256, projection
  shortcut 64->256) -> block1/block2 (identity shortcuts) -> y [56,56,256]

HBM traffic per image falls from ~18 MB to 2.0 MB (0.4 read + 1.6 write).
The 3x3 convs are im2col-in-VMEM: nine pltpu.roll row-shifts of the
[3136, 64] activation (row = y*56+x) with edge masks build the [3136, 576]
patch matrix, so conv2 is ONE matmul with K=576 (4.5 MXU tiles) instead of
nine K=64 (half-empty) accumulations. All matmuls accumulate in f32
(preferred_element_type) regardless of compute dtype.

Semantics match the eval-mode (BN-folded) bottleneck math of
ops/quant.folded_resnet50_forward exactly; equivalence is pinned in
tests/test_pallas_block.py (interpret mode) and re-checked on-chip by
scripts/probe_pallas_block.py before it times anything (interpret-green
Pallas code has twice hidden Mosaic-only failures — PERF.md round 3).

Reference provenance: the blocks themselves mirror torchvision ResNet50
layer1 (reference models/pose_net_rgb.py:18-20 uses it as the backbone);
this fusion is a TPU-design choice with no reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interpret(flag: bool) -> bool:
    """Pallas TPU kernels interpret automatically on the CPU backend, so
    the folded+pallas serving mode stays runnable in CPU tests and the
    driver's virtual-device dryrun; on TPU the real Mosaic kernel runs."""
    return flag or jax.default_backend() == "cpu"


H = W = 56
HW = H * W  # 3136 rows, row-major: r = y*56 + x

# Mosaic budgets kernel stack allocations against a 16 MiB default scoped
# VMEM limit; the fused kernels' per-image working sets (patch matrix + f32
# accumulators + roll temporaries) exceed it (bench round 4: fused_layer1
# asked 28.5 MiB). v5e has 128 MiB of physical VMEM — raise the budget,
# leaving headroom for the pipeline's double-buffered operands. The batch
# grid is embarrassingly parallel (disjoint image blocks per step).
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=96 * 1024 * 1024,
)
CIN = 64  # layer1 input channels (post-maxpool)
CMID = 64  # bottleneck mid width
COUT = 256  # expansion 4

# (ky, kx) tap order of the [3,3,64,64] HWIO kernel, flattened to match the
# patch-matrix chunk order below
_TAPS = [(ky, kx) for ky in range(3) for kx in range(3)]


def _shift_rows_hw(t, dy, dx, h, w):
    """t [h*w, C] viewed as an [h,w,C] image (row-major rows): return the
    (dy, dx)-shifted image with zero fill — chunk[r] = t[r + dy*w + dx]
    when (y+dy, x+dx) is inside the image, else 0."""
    off = dy * w + dx
    # pltpu.roll requires a non-negative shift; the roll is circular, so
    # chunk[r] = t[r + off] is shift (-off) mod h*w (edge wraparound rows
    # are zeroed by the validity mask below). Mosaic lowers roll to
    # tpu.dynamic_rotate, implemented for 32-bit data only (probe round 4:
    # "Rotate with non-32-bit data" on bf16) — sub-32-bit inputs round-trip
    # through f32, which is exact for bf16 and VMEM-local either way.
    if off:
        shift = (-off) % (h * w)
        if jnp.dtype(t.dtype).itemsize < 4:
            rolled = pltpu.roll(t.astype(jnp.float32), shift,
                                axis=0).astype(t.dtype)
        else:
            rolled = pltpu.roll(t, shift, axis=0)
    else:
        rolled = t
    r = jax.lax.broadcasted_iota(jnp.int32, (h * w, 1), 0)
    y, x = r // w, r % w
    valid = (y + dy >= 0) & (y + dy < h) & (x + dx >= 0) & (x + dx < w)
    return jnp.where(valid, rolled, jnp.zeros_like(rolled))


def _shift_rows(t, dy, dx):
    return _shift_rows_hw(t, dy, dx, H, W)


def _conv3x3_im2col(t, w2cat, dtype):
    """3x3 same-padding conv on the [HW, CMID] activation via an in-VMEM
    im2col: ONE [HW, 576] @ [576, CMID] matmul, f32 accumulation."""
    patches = jnp.concatenate(
        [_shift_rows(t, ky - 1, kx - 1) for ky, kx in _TAPS], axis=1
    )
    return jnp.dot(
        patches, w2cat[:], preferred_element_type=jnp.float32
    )


def _layer1_kernel(
    x_ref,
    # block 0 (projection shortcut)
    w1_0, b1_0, w2_0, b2_0, w3_0, b3_0, wd_0, bd_0,
    # blocks 1, 2 (identity shortcuts)
    w1_1, b1_1, w2_1, b2_1, w3_1, b3_1,
    w1_2, b1_2, w2_2, b2_2, w3_2, b3_2,
    out_ref,
    *, dtype,
):
    x = x_ref[0].reshape(HW, CIN).astype(dtype)  # [3136, 64]

    def block(x2d, w1, b1, w2cat, b2, w3, b3, shortcut):
        # 1x1 reduce
        t = jnp.dot(x2d, w1[:], preferred_element_type=jnp.float32)
        t = jax.nn.relu(t + b1[:]).astype(dtype)
        # 3x3 (same padding) as one im2col matmul
        t = _conv3x3_im2col(t, w2cat, dtype)
        t = jax.nn.relu(t + b2[:]).astype(dtype)
        # 1x1 expand + residual
        y = jnp.dot(t, w3[:], preferred_element_type=jnp.float32) + b3[:]
        return jax.nn.relu(y + shortcut).astype(dtype)

    # block 0: projected shortcut (64 -> 256)
    r0 = jnp.dot(x, wd_0[:], preferred_element_type=jnp.float32) + bd_0[:]
    x = block(x, w1_0, b1_0, w2_0, b2_0, w3_0, b3_0, r0)
    # blocks 1, 2: identity shortcuts (dequantized f32 add, then re-cast)
    x = block(x, w1_1, b1_1, w2_1, b2_1, w3_1, b3_1,
              x.astype(jnp.float32))
    x = block(x, w1_2, b1_2, w2_2, b2_2, w3_2, b3_2,
              x.astype(jnp.float32))
    out_ref[0] = x.reshape(H, W, COUT).astype(out_ref.dtype)


def pack_layer1_weights(folded: dict, dtype=jnp.bfloat16):
    """Flatten the layer1 entries of a BN-folded ResNet50 tree
    (ops/quant.fold_bn_resnet naming: 'layer1_{j}/conv{k}', with
    'layer1_0/downsample') into the kernel's argument tuple. 1x1 kernels
    [1,1,ci,co] collapse to [ci,co]; the 3x3 kernel [3,3,cm,cm] flattens to
    [576, cm] in (ky, kx, cin) row order; biases ride as f32 [1, co]."""

    def w11(name):
        w = np.asarray(folded[name]["w"])
        return jnp.asarray(w.reshape(w.shape[2], w.shape[3]), dtype)

    def w33(name):
        w = np.asarray(folded[name]["w"])  # [3,3,cm,cm] HWIO
        return jnp.asarray(w.reshape(9 * w.shape[2], w.shape[3]), dtype)

    def b(name):
        return jnp.asarray(
            np.asarray(folded[name]["b"]).reshape(1, -1), jnp.float32)

    args = []
    for j in range(3):
        blk = f"layer1_{j}"
        args += [w11(f"{blk}/conv1"), b(f"{blk}/conv1"),
                 w33(f"{blk}/conv2"), b(f"{blk}/conv2"),
                 w11(f"{blk}/conv3"), b(f"{blk}/conv3")]
        if j == 0:
            args += [w11(f"{blk}/downsample"), b(f"{blk}/downsample")]
    return tuple(args)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def fused_layer1(x, weights, dtype=jnp.bfloat16, interpret=False):
    """Run ResNet50 layer1 (three BN-folded bottleneck blocks) as one Pallas
    kernel. x: [B, 56, 56, 64]; weights: tuple from pack_layer1_weights;
    returns [B, 56, 56, 256] in x.dtype."""
    B = x.shape[0]
    full = lambda a: pl.BlockSpec(  # noqa: E731 — whole-array VMEM operand
        a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer1_kernel, dtype=dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, CIN), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(a) for a in weights],
        out_specs=pl.BlockSpec((1, H, W, COUT), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(interpret),
    )(x, *weights)


# ------------------------------------------------- parametric fused stages
#
# fused_layer1 above is the hand-written special case; the machinery below
# generalizes the same design — one image per grid step, every bottleneck
# intermediate VMEM-resident, the 3x3 conv as ONE im2col matmul — to any
# ResNet50 stage, including a stride-2 block0 (conv2 + 1x1 downsample both
# subsample the grid; a 1x1/s2 conv is exactly "subsample rows/cols even,
# then matmul"). Worth running where block-boundary maps are
# bandwidth-bound: layer2 (28x28x512 boundaries) after layer1; layers 3-4
# are compute-bound at XLA's conv MFU and stay on the XLA path.

# (name, n_blocks, stride, cin, cmid, cout, h_in, w_in) at 224x224 input
STAGE_CFGS = {
    1: ("layer1", 3, 1, 64, 64, 256, 56, 56),
    2: ("layer2", 4, 2, 256, 128, 512, 56, 56),
    3: ("layer3", 6, 2, 512, 256, 1024, 28, 28),
    4: ("layer4", 3, 2, 1024, 512, 2048, 14, 14),
}


def _subsample2(t, h, w):
    """[h*w, C] row-major -> [h/2 * w/2, C]: keep even rows and columns."""
    c = t.shape[-1]
    t = t.reshape(h, w * c).reshape(h // 2, 2, w * c)[:, 0]
    return t.reshape(h // 2, w // 2, 2, c)[:, :, 0].reshape(-1, c)


def _conv3x3_im2col_hw(t, w2cat, h, w, stride):
    """3x3 same-padding conv (stride 1 or 2) on the [h*w, C] activation via
    in-VMEM im2col: shifted chunks (stride-2: subsampled to the output
    grid), ONE [ho*wo, 9C] @ [9C, co] matmul with f32 accumulation."""
    chunks = [_shift_rows_hw(t, ky - 1, kx - 1, h, w) for ky, kx in _TAPS]
    if stride == 2:
        chunks = [_subsample2(ch, h, w) for ch in chunks]
    patches = jnp.concatenate(chunks, axis=1)
    return jnp.dot(patches, w2cat[:], preferred_element_type=jnp.float32)


def _stage_kernel(x_ref, *refs, dtype, cfg):
    _, n_blocks, stride, cin, cmid, cout, h, w = cfg
    ho, wo = h // stride, w // stride
    x = x_ref[0].reshape(h * w, cin).astype(dtype)
    args = list(refs[:-1])
    out_ref = refs[-1]

    def take(n):
        head, rest = args[:n], args[n:]
        args[:] = rest
        return head

    for j in range(n_blocks):
        bh, bw, bs = (h, w, stride) if j == 0 else (ho, wo, 1)
        w1, b1, w2, b2, w3, b3 = take(6)
        if j == 0:
            wd, bd = take(2)
            r = x if stride == 1 else _subsample2(x, h, w)
            shortcut = jnp.dot(r, wd[:], preferred_element_type=jnp.float32
                               ) + bd[:]
        else:
            shortcut = x.astype(jnp.float32)
        t = jnp.dot(x, w1[:], preferred_element_type=jnp.float32)
        t = jax.nn.relu(t + b1[:]).astype(dtype)
        t = _conv3x3_im2col_hw(t, w2, bh, bw, bs)
        t = jax.nn.relu(t + b2[:]).astype(dtype)
        y = jnp.dot(t, w3[:], preferred_element_type=jnp.float32) + b3[:]
        x = jax.nn.relu(y + shortcut).astype(dtype)
    out_ref[0] = x.reshape(ho, wo, cout).astype(out_ref.dtype)


def pack_stage_weights(folded: dict, stage: int, dtype=jnp.bfloat16):
    """Flatten one stage's BN-folded entries (ops/quant.fold_bn_resnet
    naming) into the kernel argument tuple — same layout rules as
    pack_layer1_weights, for any stage."""
    name, n_blocks, _, _, _, _, _, _ = STAGE_CFGS[stage]

    def w11(n):
        w = np.asarray(folded[n]["w"])
        return jnp.asarray(w.reshape(w.shape[2], w.shape[3]), dtype)

    def w33(n):
        w = np.asarray(folded[n]["w"])
        return jnp.asarray(w.reshape(9 * w.shape[2], w.shape[3]), dtype)

    def b(n):
        return jnp.asarray(
            np.asarray(folded[n]["b"]).reshape(1, -1), jnp.float32)

    args = []
    for j in range(n_blocks):
        blk = f"{name}_{j}"
        args += [w11(f"{blk}/conv1"), b(f"{blk}/conv1"),
                 w33(f"{blk}/conv2"), b(f"{blk}/conv2"),
                 w11(f"{blk}/conv3"), b(f"{blk}/conv3")]
        if j == 0:
            args += [w11(f"{blk}/downsample"), b(f"{blk}/downsample")]
    return tuple(args)


@functools.partial(jax.jit, static_argnames=("stage", "dtype", "interpret"))
def fused_stage(x, weights, stage: int, dtype=jnp.bfloat16, interpret=False):
    """Run one ResNet50 bottleneck stage as a single Pallas kernel.
    x: [B, h, w, cin] for that stage at 224x224 input; weights: tuple from
    pack_stage_weights(stage). Returns [B, h/s, w/s, cout] in x.dtype."""
    cfg = STAGE_CFGS[stage]
    _, _, stride, cin, _, cout, h, w = cfg
    B = x.shape[0]
    ho, wo = h // stride, w // stride
    full = lambda a: pl.BlockSpec(  # noqa: E731 — whole-array VMEM operand
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stage_kernel, dtype=dtype, cfg=cfg),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(a) for a in weights],
        out_specs=pl.BlockSpec((1, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ho, wo, cout), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(interpret),
    )(x, *weights)


def reference_stage(x, folded, stage: int, dtype=jnp.float32):
    """Plain-XLA eval-mode bottleneck stage over the same folded tree (the
    oracle), mirroring ops/quant.folded_resnet50_forward's per-stage math."""
    from pose6d_tpu.ops.quant import _conv_f32

    name, n_blocks, stride, _, _, _, _, _ = STAGE_CFGS[stage]
    x = x.astype(dtype)
    for j in range(n_blocks):
        s = stride if j == 0 else 1
        blk = f"{name}_{j}"
        if j == 0:
            r = _conv_f32(x, jnp.asarray(folded[f"{blk}/downsample"]["w"],
                                         dtype),
                          folded[f"{blk}/downsample"]["b"], stride=s)
        else:
            r = x.astype(jnp.float32)
        y = _conv_f32(x, jnp.asarray(folded[f"{blk}/conv1"]["w"], dtype),
                      folded[f"{blk}/conv1"]["b"])
        y = jax.nn.relu(y).astype(dtype)
        y = _conv_f32(y, jnp.asarray(folded[f"{blk}/conv2"]["w"], dtype),
                      folded[f"{blk}/conv2"]["b"], stride=s,
                      padding=[(1, 1), (1, 1)])
        y = jax.nn.relu(y).astype(dtype)
        y = _conv_f32(y, jnp.asarray(folded[f"{blk}/conv3"]["w"], dtype),
                      folded[f"{blk}/conv3"]["b"])
        x = jax.nn.relu(y + r).astype(dtype)
    return x


# --------------------------------------------------------------- fused stem
#
# The OTHER bandwidth-bound prefix stage (PERF.md round 3d: stem + layer1 =
# 5.2 of 11.1 prefix-ms): conv1 7x7/s2/pad3 -> relu -> maxpool 3x3/s2/pad1.
# XLA materializes the [112,112,64] conv1 output to HBM (1.6 MB/image bf16)
# just for the maxpool to read it back; fused, HBM traffic per image is
# 0.3 MB in (the space-to-depth input) + 0.4 MB out.
#
# The 7x7/s2 conv is MXU-hostile as-is (C=3). Space-to-depth 2x2 (a pure
# layout op, done OUTSIDE the kernel in XLA on the same bytes) turns it
# into a 4x4/s1 conv over a [112,112,12] input; in VMEM the 16 taps
# concatenate into ONE [12544, 192] @ [192, 64] matmul (1.5 MXU k-tiles vs
# forty-nine K=3 slivers). The maxpool rides as shifted maxes on the relu'd
# activation (zero fill is exact post-relu) + an even-row/col subsample.

SH = SW = 112  # conv1 output grid (224/2)
SHW = SH * SW
# (u, v) tap order of the 4x4 s2d kernel; chunk order of the patch matrix
_STEM_TAPS = [(u, v) for u in range(-2, 2) for v in range(-2, 2)]


def space_to_depth_2x2(x):
    """[B, 224, 224, C] -> [B, 112, 112, 4C] with channel order
    (py, px, c): out[b, Y, X, py*2C+px*C+c] = x[b, 2Y+py, 2X+px, c].
    C=3 for RGB towers, C=1 for the rgbd depth tower."""
    B, H2, W2, C = x.shape
    x = x.reshape(B, H2 // 2, 2, W2 // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H2 // 2, W2 // 2, 4 * C)


def _stem_kernel(x_ref, w_ref, b_ref, out_ref, *, dtype, s2d_c):
    x = x_ref[0].reshape(SHW, s2d_c).astype(dtype)  # [12544, 4C]
    patches = jnp.concatenate(
        [_shift_rows_hw(x, u, v, SH, SW) for u, v in _STEM_TAPS], axis=1
    )  # [12544, 192]
    t = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    t = jax.nn.relu(t + b_ref[:]).astype(dtype)  # conv1+relu [12544, 64]
    # maxpool 3x3/s2/pad1: shifted maxes (t >= 0, so zero fill can never
    # exceed a window's true max), then even-row/col subsample
    u1 = t
    for dx in (-1, 1):
        u1 = jnp.maximum(u1, _shift_rows_hw(t, 0, dx, SH, SW))
    u2 = u1
    for dy in (-1, 1):
        u2 = jnp.maximum(u2, _shift_rows_hw(u1, dy, 0, SH, SW))
    # subsample y even: [112, 112*64] -> [56, 2, 112*64] -> row 0
    u2 = u2.reshape(SH, SW * CIN).reshape(SH // 2, 2, SW * CIN)[:, 0]
    # subsample x even: [56, 112, 64] -> [56, 56, 2, 64] -> col 0
    u2 = u2.reshape(SH // 2, SW // 2, 2, CIN)[:, :, 0]
    out_ref[0] = u2.astype(out_ref.dtype)


def pack_stem_weights(folded: dict, dtype=jnp.bfloat16):
    """Rearrange the BN-folded conv1 kernel [7,7,C,64] into the fused stem
    kernel's argument pair: (w2cat [16*4C,64] dtype, b [1,64] f32). Row
    order of w2cat matches the patch chunks: tap (u,v) in _STEM_TAPS order,
    then channel (py, px, c) — w2cat[(u,v) chunk][py*2C+px*C+c] =
    conv1_w[2u+py+3, 2v+px+3, c] (zero where the 7x7 kernel has no tap).
    C=3 for RGB towers, C=1 for the rgbd depth tower."""
    w = np.asarray(folded["conv1"]["w"])  # [7,7,C,64] HWIO
    ci, co = w.shape[2], w.shape[3]
    w2 = np.zeros((len(_STEM_TAPS), 4 * ci, co), np.float32)
    for t, (u, v) in enumerate(_STEM_TAPS):
        for py in range(2):
            for px in range(2):
                ky, kx = 2 * u + py + 3, 2 * v + px + 3
                if 0 <= ky <= 6 and 0 <= kx <= 6:
                    lo = py * 2 * ci + px * ci
                    w2[t, lo:lo + ci] = w[ky, kx]
    b = np.asarray(folded["conv1"]["b"]).reshape(1, -1)
    return (jnp.asarray(w2.reshape(-1, co), dtype),
            jnp.asarray(b, jnp.float32))


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def fused_stem(x, weights, dtype=jnp.bfloat16, interpret=False):
    """conv1 7x7/s2 + relu + maxpool 3x3/s2 as one Pallas kernel.
    x: [B, 224, 224, C] (C=3 RGB, C=1 depth); weights: pair from
    pack_stem_weights; returns [B, 56, 56, 64] in x.dtype — ResNet50
    layer1's input."""
    B = x.shape[0]
    x2 = space_to_depth_2x2(x)  # XLA-side pure layout op
    s2d_c = x2.shape[-1]
    w2cat, b = weights
    full = lambda a: pl.BlockSpec(  # noqa: E731 — whole-array VMEM operand
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stem_kernel, dtype=dtype, s2d_c=s2d_c),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, SH, SW, s2d_c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(w2cat), full(b)],
        out_specs=pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CIN), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(interpret),
    )(x2, w2cat, b)


def reference_stem(x, folded, dtype=jnp.float32):
    """Plain-XLA eval-mode stem over the same folded tree (equivalence
    oracle): conv1 -> relu -> maxpool, the exact math of
    ops/quant.folded_resnet50_forward's prefix."""
    from pose6d_tpu.ops.quant import _conv_f32, nn_max_pool

    y = _conv_f32(x.astype(dtype), jnp.asarray(folded["conv1"]["w"], dtype),
                  folded["conv1"]["b"], stride=2, padding=[(3, 3), (3, 3)])
    return nn_max_pool(jax.nn.relu(y).astype(dtype))


def reference_layer1(x, folded, dtype=jnp.float32):
    """Plain-XLA eval-mode layer1 over the same folded tree (the baseline
    the kernel is probed against, and the equivalence oracle in tests) —
    the exact conv math of ops/quant.folded_resnet50_forward restricted to
    layer1, with castings mirroring the kernel's f32-accumulate contract."""
    from pose6d_tpu.ops.quant import _conv_f32

    x = x.astype(dtype)
    for j in range(3):
        blk = f"layer1_{j}"
        if j == 0:
            r = _conv_f32(x, jnp.asarray(folded[f"{blk}/downsample"]["w"],
                                         dtype),
                          folded[f"{blk}/downsample"]["b"])
        else:
            r = x.astype(jnp.float32)
        y = _conv_f32(x, jnp.asarray(folded[f"{blk}/conv1"]["w"], dtype),
                      folded[f"{blk}/conv1"]["b"])
        y = jax.nn.relu(y).astype(dtype)
        y = _conv_f32(y, jnp.asarray(folded[f"{blk}/conv2"]["w"], dtype),
                      folded[f"{blk}/conv2"]["b"], padding=[(1, 1), (1, 1)])
        y = jax.nn.relu(y).astype(dtype)
        y = _conv_f32(y, jnp.asarray(folded[f"{blk}/conv3"]["w"], dtype),
                      folded[f"{blk}/conv3"]["b"])
        x = jax.nn.relu(y + r).astype(dtype)
    return x
