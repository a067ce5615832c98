"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pose6d_tpu.ops.augment import AugmentConfig
from pose6d_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    shard_params,
    shard_state,
)
from pose6d_tpu.train import TrainConfig, create_train_state, make_train_step

IMG = 64


def _dummy_batch(bs, img=IMG, rng=None):
    rng = rng or np.random.default_rng(0)
    return {
        "rgb": rng.uniform(0, 1, size=(bs, img, img, 3)).astype(np.float32),
        "quat": np.tile(np.array([[0, 0, 0, 1]], np.float32), (bs, 1)),
        "trans": np.tile(np.array([[0, 0, 0.8]], np.float32), (bs, 1)),
        "obj_id": np.zeros(bs, np.int32),
        "center_orig": np.full((bs, 2), 32.0, np.float32),
        "cam_K": np.tile(np.eye(3, dtype=np.float32)[None] * 100, (bs, 1, 1)),
        "center_crop": np.full((bs, 2), 32.0, np.float32),
        "cam_K_crop": np.tile(np.eye(3, dtype=np.float32)[None] * 100, (bs, 1, 1)),
        "valid": np.ones(bs, bool),
    }


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh((4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_train_step_runs_sharded():
    mesh = make_mesh((8, 1))
    cfg = TrainConfig(variant="rgb", img_size=IMG, batch_size=16,
                      augment=AugmentConfig(grayscale_p=0.0))
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(model, tx, cfg)
    state = shard_state(state, mesh)
    batch = shard_batch(_dummy_batch(16), mesh)
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_tp_param_sharding_applied():
    mesh = make_mesh((4, 2))
    cfg = TrainConfig(variant="rgb", img_size=IMG)
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    sharded = shard_params(state.params, mesh, tp=True)
    # the wide head layer is column-sharded over 'model'
    k = sharded["rot_dense0"]["kernel"]
    spec = k.sharding.spec
    assert spec == P(None, MODEL_AXIS)
    # conv backbone stays replicated
    conv = sharded["backbone"]["conv1"]["kernel"]
    assert conv.sharding.spec == P()


def test_dp_tp_train_step_runs():
    mesh = make_mesh((4, 2))
    cfg = TrainConfig(variant="rgb", img_size=IMG, batch_size=8,
                      augment=AugmentConfig(grayscale_p=0.0))
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(model, tx, cfg)
    state = shard_state(state, mesh)
    batch = shard_batch(_dummy_batch(8), mesh)
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # params keep their tp sharding after the update
    spec = state.params["rot_dense0"]["kernel"].sharding.spec
    assert spec == P(None, MODEL_AXIS)


def test_dp_matches_single_device_loss():
    cfg = TrainConfig(variant="rgb", img_size=IMG, batch_size=8,
                      augment=AugmentConfig(grayscale_p=0.0))
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(model, tx, cfg)
    batch = _dummy_batch(8)
    key = jax.random.key(1)

    _, m_single = step(jax.tree.map(jnp.asarray, state), {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = make_mesh((8, 1))
    model2, tx2, state2 = create_train_state(cfg, jax.random.key(0))
    step2 = make_train_step(model2, tx2, cfg)
    state2 = shard_state(state2, mesh)
    batch2 = shard_batch(batch, mesh)
    _, m_dp = step2(state2, batch2, key)
    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-4)


def test_sharded_trainer_fit_and_resume(tmp_path_factory):
    """Trainer(mesh=...) end-to-end: sharded fit, ckpt, re-sharded resume."""
    from pose6d_tpu.data.synthetic import generate_synthetic_linemod
    from pose6d_tpu.train import Trainer

    root = tmp_path_factory.mktemp("linemod_mesh")
    synth = generate_synthetic_linemod(str(root), obj_ids=(1, 2), frames_per_obj=20, seed=3)
    mesh = make_mesh((4, 2))
    cfg = TrainConfig(variant="rgb", img_size=IMG, batch_size=8, epochs=1,
                      augment=AugmentConfig(grayscale_p=0.0))
    save_dir = str(tmp_path_factory.mktemp("ckpt_mesh"))
    trainer = Trainer(cfg, synth["data"], synth["models"], save_dir,
                      seed=0, num_workers=0, mesh=mesh)
    best = trainer.fit(epochs=1)
    assert np.isfinite(best)
    # tp sharding survives the whole epoch of donated updates
    assert trainer.state.params["rot_dense0"]["kernel"].sharding.spec == P(None, MODEL_AXIS)

    trainer2 = Trainer(cfg, synth["data"], synth["models"], save_dir,
                       seed=0, num_workers=0, mesh=mesh)
    assert trainer2.try_resume()
    assert trainer2.start_epoch == 1
    # restored params are re-sharded onto the mesh
    assert trainer2.state.params["rot_dense0"]["kernel"].sharding.spec == P(None, MODEL_AXIS)


def test_trainer_rejects_indivisible_batch():
    from pose6d_tpu.train import Trainer

    mesh = make_mesh((8, 1))
    cfg = TrainConfig(variant="rgb", img_size=IMG, batch_size=6)
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(cfg, "/nonexistent", "/nonexistent", "/tmp/x", mesh=mesh)

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
