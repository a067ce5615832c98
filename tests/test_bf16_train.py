"""Mixed-precision training (TrainConfig.compute_dtype="bfloat16").

The TPU-native training recipe: model compute in bf16, params / optimizer
state / BN running stats / loss in f32 (v5e emulates f32 convs at ~1/6 the
bf16 MXU rate — PERF.md round-3 training section). These tests pin the
contract: params stay f32, the step runs and learns, the first-step loss
matches the f32 baseline within bf16 tolerance (identical f32 init), and
validation always evaluates in f32.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.train.loop import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from pose6d_tpu.losses.pose_loss import PoseLossConfig


def _batch(rng, B=4, S=32):
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return {
        "rgb": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0, 1, (B, S, S, 1)), jnp.float32),
        "quat": jnp.asarray(q, jnp.float32),
        "trans": jnp.asarray(rng.normal(0, 0.05, (B, 3)) + [0, 0, 0.6],
                             jnp.float32),
    }


def _cfg(dtype, variant="rgbd"):
    return TrainConfig(variant=variant, img_size=32, batch_size=4,
                       learning_rate=1e-3, compute_dtype=dtype,
                       loss=PoseLossConfig())


@pytest.mark.parametrize("variant", ["rgb", "rgbd"])
def test_bf16_step_runs_params_stay_f32(variant):
    cfg = _cfg("bfloat16", variant)
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    assert model.config.dtype == jnp.bfloat16
    # param_dtype stays f32 under mixed precision
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))

    step = make_train_step(model, tx, cfg)
    batch = _batch(np.random.default_rng(0))
    losses = []
    for i in range(10):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # memorizing one tiny batch: best-so-far must improve over the start
    assert min(losses[1:]) < losses[0]
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))


def test_bf16_first_loss_matches_f32_init():
    # identical f32 init (param_dtype is f32 in both), so the first forward
    # differs only by bf16 rounding
    batch = _batch(np.random.default_rng(1))
    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = _cfg(dtype)
        model, tx, state = create_train_state(cfg, jax.random.key(0))
        step = make_train_step(model, tx, cfg)
        _, metrics = step(state, batch, jax.random.key(0))
        losses[dtype] = float(metrics["loss"])
    assert losses["bfloat16"] == pytest.approx(losses["float32"], rel=5e-2)


def test_eval_step_forces_f32():
    from pose6d_tpu.train.loop import make_eval_step

    cfg = _cfg("bfloat16", "rgb")
    model, tx, state = create_train_state(cfg, jax.random.key(0))

    class _Eval:  # minimal ADDEvaluator stand-in
        points = jnp.zeros((1, 8, 3))
        diameters = jnp.ones((1,))
        symmetric = jnp.zeros((1,), bool)
        present = jnp.ones((1,), bool)
        num_valid = jnp.ones((1,), jnp.int32)

    step = make_eval_step(model, cfg, _Eval())
    batch = _batch(np.random.default_rng(2))
    batch["obj_id"] = jnp.zeros((4,), jnp.int32)
    batch["valid"] = jnp.ones((4,), bool)
    m = step(state, batch)
    # outputs came from an f32 forward
    assert m["pred_rot"].dtype == jnp.float32
    assert np.isfinite(float(m["loss"]))

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
