"""End-to-end training slice on the synthetic LineMOD fixture.

Exercises everything except YOLO: host loader -> on-device augmentation ->
PoseNet forward/backward -> AdamW+clip -> BatchNorm updates -> batched ADD
validation -> plateau scheduler -> orbax checkpoint + resume. Uses a small
image size to keep CPU runtime reasonable.
"""

import os

import jax
import numpy as np
import pytest

from pose6d_tpu.data.synthetic import generate_synthetic_linemod
from pose6d_tpu.train import TrainConfig, Trainer
from pose6d_tpu.ops.augment import AugmentConfig

IMG = 64


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("linemod_train")
    return generate_synthetic_linemod(str(root), obj_ids=(1, 2), frames_per_obj=20, seed=7)


@pytest.fixture(scope="module")
def small_cfg():
    return TrainConfig(
        variant="rgb",
        img_size=IMG,
        batch_size=8,
        epochs=2,
        augment=AugmentConfig(grayscale_p=0.1),
    )


def test_train_two_epochs_and_resume(synth, small_cfg, tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("ckpt"))
    trainer = Trainer(
        small_cfg, synth["data"], synth["models"], save_dir, seed=0, num_workers=0
    )
    assert len(trainer.train_loader) == 32 and len(trainer.val_loader) == 4

    best = trainer.fit(epochs=2)
    assert np.isfinite(best)
    assert trainer.ckpt.has_checkpoint("last")
    # deployment-aligned selection runs alongside the reference rule: the
    # corrected-metric best checkpoint and CSV column both exist
    assert trainer.ckpt.has_checkpoint("best_deploy")
    assert np.isfinite(trainer.best_deploy_acc)
    assert os.path.exists(os.path.join(save_dir, "metrics.csv"))
    with open(os.path.join(save_dir, "metrics.csv")) as f:
        assert "val_acc_deploy" in f.readline().split(",")

    # loss must be finite and the state advanced
    assert int(trainer.state.step) == 2 * (32 // 8)

    # resume: a fresh trainer restores epoch/best/scheduler
    trainer2 = Trainer(
        small_cfg, synth["data"], synth["models"], save_dir, seed=0, num_workers=0
    )
    assert trainer2.try_resume()
    assert trainer2.start_epoch == 2
    assert trainer2.best_acc == pytest.approx(best)
    assert trainer2.best_deploy_acc == pytest.approx(trainer.best_deploy_acc)
    # restored params match
    p_old = jax.tree.leaves(trainer.state.params)[0]
    p_new = jax.tree.leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p_old), np.asarray(p_new))

    # crash-resilience: with `last` destroyed mid-save (tmp-rename window),
    # resume falls back to `best` instead of silently restarting fresh
    import shutil

    trainer.ckpt.save(trainer.state, epoch=1, best_acc=1.0, curr_acc=1.0,
                      curr_add=50.0, scheduler_state=trainer.scheduler.state_dict(),
                      is_best=True)
    shutil.rmtree(os.path.join(save_dir, "last"))
    trainer3 = Trainer(
        small_cfg, synth["data"], synth["models"], save_dir, seed=0, num_workers=0
    )
    assert trainer3.try_resume()
    assert trainer3.start_epoch == 2  # epoch 1 (from best) + 1
    p3 = jax.tree.leaves(trainer3.state.params)[0]
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p_old))


def test_geometric_variant_one_step(synth, tmp_path_factory):
    cfg = TrainConfig(
        variant="rgbd_geometric", img_size=IMG, batch_size=4, epochs=1,
        augment=AugmentConfig(grayscale_p=0.0),
    )
    save_dir = str(tmp_path_factory.mktemp("ckpt_g"))
    trainer = Trainer(cfg, synth["data"], synth["models"], save_dir, seed=1, num_workers=0)
    rng = np.random.default_rng(0)
    batch = next(trainer.train_loader.batches(4, rng, shuffle=False))
    key = jax.random.key(0)
    # the step donates its input state — always rebind
    trainer.state, metrics = trainer.train_step(trainer.state, batch, key)
    assert np.isfinite(float(metrics["loss"]))

    # geometric translation is non-learned: depth at center back-projected.
    # On synthetic data the depth map equals gt z over the object, so the
    # eval translation error should be small already at init.
    vb = next(trainer.val_loader.batches(4, rng, shuffle=False, drop_remainder=False))
    m = trainer.eval_step(trainer.state, vb)
    pred_t = np.asarray(m["pred_trans"])
    gt_t = vb["trans"]
    # z from the depth sensor should be within a few cm of gt z
    assert np.abs(pred_t[:, 2] - gt_t[:, 2]).max() < 0.05
    # geometric variants already derive X/Y by pinhole, so the deployment-
    # aligned metric coincides with the plain val metric
    assert float(m["add_01d_acc_deploy"]) == pytest.approx(float(m["add_01d_acc"]))


@pytest.mark.parametrize("variant,flavor", [("rgb_geometric", "rgb"), ("rgbd", "rgbd")])
def test_remaining_variants_one_step(synth, tmp_path_factory, variant, flavor):
    cfg = TrainConfig(
        variant=variant, img_size=IMG, batch_size=4, epochs=1,
        augment=AugmentConfig(grayscale_p=0.0),
    )
    save_dir = str(tmp_path_factory.mktemp(f"ckpt_{variant}"))
    trainer = Trainer(cfg, synth["data"], synth["models"], save_dir, seed=2, num_workers=0)
    rng = np.random.default_rng(0)
    batch = next(trainer.train_loader.batches(4, rng, shuffle=False))
    trainer.state, metrics = trainer.train_step(trainer.state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    vb = next(trainer.val_loader.batches(4, rng, shuffle=False, drop_remainder=False))
    m = trainer.eval_step(trainer.state, vb)
    assert np.isfinite(float(m["add_mean"]))

    if variant == "rgbd":
        # learned-translation variant: the deployment-aligned metric must
        # equal add_metrics on the pinhole-corrected translation (the exact
        # quantity infer/pipeline.py deploys)
        import jax.numpy as jnp
        from pose6d_tpu.geometry.pinhole import pinhole_xy_from_z
        from pose6d_tpu.geometry.quat import quat_to_mat
        from pose6d_tpu.losses.add import add_metrics

        ev = trainer.evaluator
        pred_rot = jnp.asarray(m["pred_rot"])
        corrected = pinhole_xy_from_z(
            jnp.asarray(m["pred_trans"])[:, 2],
            jnp.asarray(vb["center_orig"]), jnp.asarray(vb["cam_K"]),
        )
        obj_ids = jnp.where(jnp.asarray(vb["valid"]), jnp.asarray(vb["obj_id"]), -1)
        expected = add_metrics(
            ev.points, ev.diameters, ev.symmetric, ev.present,
            quat_to_mat(pred_rot), corrected,
            quat_to_mat(jnp.asarray(vb["quat"])), jnp.asarray(vb["trans"]),
            obj_ids, num_valid=ev.num_valid,
        )
        assert float(m["add_01d_acc_deploy"]) == pytest.approx(
            float(expected["add_01d_acc"]), abs=1e-4
        )

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
