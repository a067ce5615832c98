"""DetectionTrainer: affine augmentation semantics + full-state resume parity.

The reference resumes the complete ultralytics trainer state
(scripts/training/train_yolo.py:35-39); these tests pin our equivalents:
optimizer moments, global step (schedule + EMA ramp), completed epochs, and
best-mAP gating of the 'best' checkpoint.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.data.synthetic import generate_synthetic_linemod
from pose6d_tpu.models.yolo.train import (
    DetTrainConfig,
    DetectionTrainer,
    affine_augment,
)

IMG = 64


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("det_synth")
    return generate_synthetic_linemod(str(root), obj_ids=(1, 2), frames_per_obj=20, seed=11)


# ------------------------------------------------------------------- affine


def test_affine_identity_when_disabled():
    cfg = DetTrainConfig(img_size=IMG, affine_scale=0.0, affine_translate=0.0)
    img = jax.random.uniform(jax.random.key(0), (IMG, IMG, 3))
    boxes = jnp.asarray([[10.0, 20.0, 40.0, 50.0], [2.0, 2.0, 9.0, 9.0]])
    mask = jnp.asarray([True, True])
    out, nb, nm = affine_augment(jax.random.key(1), img, boxes, mask, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nb), np.asarray(boxes), atol=1e-4)
    assert np.asarray(nm).all()


def test_affine_filters_degenerate_boxes():
    # identity transform, but a zero-area box must be dropped by the
    # box_candidates filter (w, h > 2px)
    cfg = DetTrainConfig(img_size=IMG, affine_scale=0.0, affine_translate=0.0)
    img = jnp.zeros((IMG, IMG, 3))
    boxes = jnp.asarray([[5.0, 5.0, 5.0, 5.0], [10.0, 10.0, 30.0, 30.0]])
    mask = jnp.asarray([True, True])
    _, _, nm = affine_augment(jax.random.key(0), img, boxes, mask, cfg)
    assert not bool(nm[0]) and bool(nm[1])


def test_affine_boxes_follow_pixels():
    # a white rectangle on black: after a random scale+translate the surviving
    # box must still frame the bright pixels
    cfg = DetTrainConfig(img_size=IMG, affine_scale=0.4, affine_translate=0.1)
    img = np.zeros((IMG, IMG, 3), np.float32)
    x1, y1, x2, y2 = 16, 24, 40, 48
    img[y1:y2, x1:x2] = 1.0
    boxes = jnp.asarray([[float(x1), float(y1), float(x2), float(y2)]])
    mask = jnp.asarray([True])
    out, nb, nm = affine_augment(
        jax.random.key(3), jnp.asarray(img), boxes, mask, cfg, fill=0.0
    )
    assert bool(nm[0]), "box unexpectedly filtered"
    out = np.asarray(out)
    bx = np.asarray(nb[0])
    ys, xs = np.where(out[..., 0] > 0.5)
    assert len(xs) > 0
    # bright pixels live inside the transformed box (1px bilinear tolerance)
    assert xs.min() >= bx[0] - 1.5 and xs.max() <= bx[2] + 1.5
    assert ys.min() >= bx[1] - 1.5 and ys.max() <= bx[3] + 1.5


def test_affine_scale_changes_extent():
    # with pure scaling (translate=0) the box area scales by s^2; check the
    # box actually changed for a key where s != 1
    cfg = DetTrainConfig(img_size=IMG, affine_scale=0.5, affine_translate=0.0)
    img = jnp.zeros((IMG, IMG, 3))
    boxes = jnp.asarray([[24.0, 24.0, 40.0, 40.0]])
    out, nb, nm = affine_augment(jax.random.key(7), img, boxes, jnp.asarray([True]), cfg)
    w0 = 16.0
    w1 = float(nb[0, 2] - nb[0, 0])
    assert abs(w1 - w0) > 0.5  # s drawn from U(0.5, 1.5) is ~never exactly 1
    # centered scaling: box stays centered at the frame center
    cx = float(nb[0, 0] + nb[0, 2]) / 2
    np.testing.assert_allclose(cx, 32.0, atol=0.5)


# ------------------------------------------------------------------- resume


def test_full_state_resume_and_best_gating(synth, tmp_path):
    import orbax.checkpoint as ocp

    save_dir = str(tmp_path / "yolo_ckpt")
    cfg = DetTrainConfig(img_size=IMG, batch_size=8, epochs=2, seed=0)

    t1 = DetectionTrainer(synth["data"], save_dir, cfg)
    t1.validate_map50 = lambda rng: 0.5  # decouple gating from real mAP
    t1.fit(epochs=1)
    steps_per_epoch = max(len(t1.train_loader) // cfg.batch_size, 1)
    assert int(t1.global_step) == steps_per_epoch
    assert t1.completed_epochs == 1 and t1.best_map == 0.5

    # 'best' was written, carrying the gated mAP and epoch
    best = ocp.StandardCheckpointer().restore(os.path.join(save_dir, "best"))
    assert float(best["meta"]["best_map"]) == 0.5
    assert int(best["meta"]["epoch"]) == 1

    # training curve logged (ultralytics results.csv analogue)
    with open(os.path.join(save_dir, "metrics.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("epoch,train_loss,map50") and len(lines) == 2

    # fresh trainer: resume restores step/epoch/best and optimizer moments
    t2 = DetectionTrainer(synth["data"], save_dir, cfg)
    assert t2.try_resume()
    assert int(t2.global_step) == steps_per_epoch
    assert t2.completed_epochs == 1 and t2.best_map == 0.5
    mu1 = jax.tree.leaves(t1.opt_state)
    mu2 = jax.tree.leaves(t2.opt_state)
    assert any(
        np.allclose(np.asarray(a), np.asarray(b)) and np.asarray(a).size > 1
        for a, b in zip(mu1, mu2)
    )

    # continue to epoch 2 with a WORSE val mAP: epoch 1 is skipped, the
    # schedule/EMA step keeps counting, and 'best' is NOT overwritten
    t2.validate_map50 = lambda rng: 0.3
    t2.fit(epochs=2)
    assert int(t2.global_step) == 2 * steps_per_epoch
    assert t2.completed_epochs == 2 and t2.best_map == 0.5
    best = ocp.StandardCheckpointer().restore(os.path.join(save_dir, "best"))
    assert float(best["meta"]["best_map"]) == 0.5
    assert int(best["meta"]["epoch"]) == 1

    # resuming at the target epoch count trains nothing
    t3 = DetectionTrainer(synth["data"], save_dir, cfg)
    t3.validate_map50 = lambda rng: pytest.fail("should not validate")
    t3.fit(epochs=2)
    assert int(t3.global_step) == 2 * steps_per_epoch

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow


def test_nonfinite_step_is_skipped(synth, tmp_path):
    # the AMP-GradScaler analogue: a batch that produces inf/nan gradients
    # must leave params, batch_stats AND future steps intact (one bad step
    # otherwise nukes every parameter through clip_by_global_norm's
    # 0 * inf = NaN scale — observed on a resumed scene fine-tune).
    cfg = DetTrainConfig(img_size=IMG, batch_size=4, epochs=1, seed=0)
    t = DetectionTrainer(synth["data"], str(tmp_path / "ckpt"), cfg)
    rng = np.random.default_rng(0)
    batch = next(iter(t.train_loader.batches(4, rng, shuffle=False)))
    key = jax.random.key(0)

    poisoned = dict(batch)
    img = np.asarray(batch["image"], np.float32).copy()
    img[0, 0, 0, :] = np.inf
    poisoned["image"] = img

    p0 = jax.tree.map(lambda x: np.asarray(x), t.params)
    bs0 = jax.tree.map(lambda x: np.asarray(x), t.batch_stats)
    params, batch_stats, opt_state, losses = t.step_fn(
        t.params, t.batch_stats, t.opt_state, poisoned, key)
    assert not np.isfinite(float(losses["total"]))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(batch_stats)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # training continues normally from the survived state
    params2, _, _, losses2 = t.step_fn(
        params, batch_stats, opt_state, batch, key)
    assert np.isfinite(float(losses2["total"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2))
    )
    assert changed
