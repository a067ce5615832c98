"""Equivalence of the fused Pallas layer1 kernel (ops/pallas_block) vs the
plain-XLA BN-folded bottleneck math it replaces.

Interpret mode only (CPU suite); the on-chip numerics re-check lives in
scripts/probe_pallas_block.py — interpret-green Pallas code has twice
hidden Mosaic-only failures (PERF.md round 3), so the probe validates
before it times.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.ops.pallas_block import (
    fused_layer1,
    fused_stem,
    pack_layer1_weights,
    pack_stem_weights,
    reference_layer1,
    reference_stem,
    space_to_depth_2x2,
)


def _random_folded(rng, scale=0.05):
    """A random BN-folded layer1 tree in ops/quant naming. Small weights keep
    bf16 activations in a well-conditioned range."""
    folded = {}

    def entry(name, ci, co, k=1):
        folded[name] = {
            "w": rng.standard_normal((k, k, ci, co)).astype(np.float32) * scale,
            "b": rng.standard_normal((co,)).astype(np.float32) * scale,
        }

    for j in range(3):
        blk = f"layer1_{j}"
        entry(f"{blk}/conv1", 64 if j == 0 else 256, 64)
        entry(f"{blk}/conv2", 64, 64, k=3)
        entry(f"{blk}/conv3", 64, 256)
    entry("layer1_0/downsample", 64, 256)
    return folded


@pytest.mark.parametrize("batch", [1, 3])
def test_fused_layer1_matches_xla_f32(rng, batch):
    folded = _random_folded(rng)
    x = jnp.asarray(rng.standard_normal((batch, 56, 56, 64)), jnp.float32)
    got = fused_layer1(x, pack_layer1_weights(folded, jnp.float32),
                       dtype=jnp.float32, interpret=True)
    want = reference_layer1(x, folded, jnp.float32)
    assert got.shape == (batch, 56, 56, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_layer1_bf16_close_to_f32_oracle(rng):
    """bf16 compute with f32 accumulation must stay within bf16 rounding of
    the f32 oracle — this bounds BOTH the kernel's and XLA's bf16 error, so
    it holds regardless of where each path rounds."""
    folded = _random_folded(rng)
    x = jnp.asarray(rng.standard_normal((2, 56, 56, 64)), jnp.bfloat16)
    got = fused_layer1(x, pack_layer1_weights(folded, jnp.bfloat16),
                       dtype=jnp.bfloat16, interpret=True)
    want = reference_layer1(x.astype(jnp.float32), folded, jnp.float32)
    want = np.asarray(want)
    err = np.abs(np.asarray(got, np.float32) - want)
    scale = want.std()  # relative-to-zero errors near ReLU kinks are fine
    assert np.mean(err) < 0.02 * scale
    assert np.max(err) < 0.25 * scale  # bf16 tail after 3 residual blocks


def test_fused_layer1_edge_pixels_zero_padded(rng):
    """The im2col shift masks must reproduce conv2's zero 'same' padding: a
    constant-interior input makes any padding error show up at the border."""
    folded = _random_folded(rng)
    x = jnp.ones((1, 56, 56, 64), jnp.float32)
    got = fused_layer1(x, pack_layer1_weights(folded, jnp.float32),
                       dtype=jnp.float32, interpret=True)
    want = reference_layer1(x, folded, jnp.float32)
    border = np.s_[0, [0, -1], :, :]
    np.testing.assert_allclose(np.asarray(got)[border],
                               np.asarray(want)[border], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got)[0, :, [0, -1], :],
                               np.asarray(want)[0, :, [0, -1], :],
                               rtol=1e-5, atol=1e-5)


def _random_stem(rng, scale=0.05):
    return {"conv1": {
        "w": rng.standard_normal((7, 7, 3, 64)).astype(np.float32) * scale,
        "b": rng.standard_normal((64,)).astype(np.float32) * scale,
    }}


def test_space_to_depth_layout(rng):
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)
    y = np.asarray(space_to_depth_2x2(x))
    xn = np.asarray(x)
    for py in range(2):
        for px in range(2):
            np.testing.assert_array_equal(
                y[:, :, :, py * 6 + px * 3:py * 6 + px * 3 + 3],
                xn[:, py::2, px::2, :])


@pytest.mark.parametrize("batch", [1, 2])
def test_fused_stem_matches_xla_f32(rng, batch):
    folded = _random_stem(rng)
    x = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.float32)
    got = fused_stem(x, pack_stem_weights(folded, jnp.float32),
                     dtype=jnp.float32, interpret=True)
    want = reference_stem(x, folded, jnp.float32)
    assert got.shape == (batch, 56, 56, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stem_bf16_close_to_f32_oracle(rng):
    folded = _random_stem(rng)
    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)), jnp.bfloat16)
    got = fused_stem(x, pack_stem_weights(folded, jnp.bfloat16),
                     dtype=jnp.bfloat16, interpret=True)
    want = np.asarray(reference_stem(x.astype(jnp.float32), folded,
                                     jnp.float32))
    err = np.abs(np.asarray(got, np.float32) - want)
    scale = want.std()
    assert np.mean(err) < 0.02 * scale
    assert np.max(err) < 0.25 * scale


def test_fused_stem_edges_zero_padded(rng):
    """conv1's pad-3 border and the maxpool's pad-1 border must both match
    XLA exactly (a constant input exposes any padding mismatch)."""
    folded = _random_stem(rng)
    x = jnp.ones((1, 224, 224, 3), jnp.float32)
    got = np.asarray(fused_stem(x, pack_stem_weights(folded, jnp.float32),
                                dtype=jnp.float32, interpret=True))
    want = np.asarray(reference_stem(x, folded, jnp.float32))
    np.testing.assert_allclose(got[0, [0, -1], :, :], want[0, [0, -1], :, :],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[0, :, [0, -1], :], want[0, :, [0, -1], :],
                               rtol=1e-5, atol=1e-5)


def test_fused_stem_depth_tower_1ch(rng):
    """The rgbd depth tower's conv1 is 1-channel (models/convert.py sum
    init); the stem kernel must handle C=1 (s2d channels 4)."""
    folded = {"conv1": {
        "w": rng.standard_normal((7, 7, 1, 64)).astype(np.float32) * 0.05,
        "b": rng.standard_normal((64,)).astype(np.float32) * 0.05,
    }}
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 1)), jnp.float32)
    got = fused_stem(x, pack_stem_weights(folded, jnp.float32),
                     dtype=jnp.float32, interpret=True)
    want = reference_stem(x, folded, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _random_stage(rng, stage, scale=0.05):
    from pose6d_tpu.ops.pallas_block import STAGE_CFGS

    name, n_blocks, _, cin, cmid, cout, _, _ = STAGE_CFGS[stage]
    folded = {}

    def entry(n, ci, co, k=1):
        folded[n] = {
            "w": rng.standard_normal((k, k, ci, co)).astype(np.float32) * scale,
            "b": rng.standard_normal((co,)).astype(np.float32) * scale,
        }

    for j in range(n_blocks):
        blk = f"{name}_{j}"
        entry(f"{blk}/conv1", cin if j == 0 else cout, cmid)
        entry(f"{blk}/conv2", cmid, cmid, k=3)
        entry(f"{blk}/conv3", cmid, cout)
    entry(f"{name}_0/downsample", cin, cout)
    return folded


@pytest.mark.parametrize("stage", [1, 2])
def test_fused_stage_matches_xla_f32(rng, stage):
    """The parametric stage kernel reproduces XLA's bottleneck math exactly
    at f32 — stage 1 (stride 1) and stage 2 (stride-2 block0: strided
    im2col + subsampled 1x1 downsample)."""
    from pose6d_tpu.ops.pallas_block import (
        STAGE_CFGS, fused_stage, pack_stage_weights, reference_stage)

    _, _, stride, cin, _, cout, h, w = STAGE_CFGS[stage]
    folded = _random_stage(rng, stage)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    got = fused_stage(x, pack_stage_weights(folded, stage, jnp.float32),
                      stage=stage, dtype=jnp.float32, interpret=True)
    want = reference_stage(x, folded, stage, jnp.float32)
    assert got.shape == (2, h // stride, w // stride, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stage1_equals_fused_layer1(rng):
    """Stage 1 of the parametric kernel is the hand-written fused_layer1."""
    from pose6d_tpu.ops.pallas_block import fused_stage, pack_stage_weights

    folded = _random_folded(rng)
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 64)), jnp.float32)
    a = fused_stage(x, pack_stage_weights(folded, 1, jnp.float32),
                    stage=1, dtype=jnp.float32, interpret=True)
    b = fused_layer1(x, pack_layer1_weights(folded, jnp.float32),
                     dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_fused_stage2_bf16_close_to_f32_oracle(rng):
    from pose6d_tpu.ops.pallas_block import (
        fused_stage, pack_stage_weights, reference_stage)

    folded = _random_stage(rng, 2)
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 256)), jnp.bfloat16)
    got = fused_stage(x, pack_stage_weights(folded, 2, jnp.bfloat16),
                      stage=2, dtype=jnp.bfloat16, interpret=True)
    want = np.asarray(
        reference_stage(x.astype(jnp.float32), folded, 2, jnp.float32))
    err = np.abs(np.asarray(got, np.float32) - want)
    scale = want.std()
    assert np.mean(err) < 0.02 * scale
    assert np.max(err) < 0.3 * scale


@pytest.mark.slow
def test_folded_forward_with_pallas_prefix_matches_plain(rng):
    """End-to-end tower integration: folded_resnet50_forward with the fused
    stem + fused stages 1-2 (interpret on CPU) equals the plain folded
    forward at f32 — the exact graph eval_e2e --folded-backbone serves."""
    from pose6d_tpu.ops.pallas_block import (
        pack_stage_weights, pack_stem_weights)
    from pose6d_tpu.ops.quant import folded_resnet50_forward

    folded = {}
    for s in (1, 2, 3, 4):
        folded.update(_random_stage(rng, s, scale=0.04))
    folded.update(_random_stem(rng, scale=0.04))

    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)), jnp.float32)
    want = folded_resnet50_forward(folded, x)
    got = folded_resnet50_forward(
        folded, x,
        pallas_stem=pack_stem_weights(folded, jnp.float32),
        pallas_stages={s: pack_stage_weights(folded, s, jnp.float32)
                       for s in (1, 2)},
    )
    assert got.shape == want.shape == (1, 2048)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
