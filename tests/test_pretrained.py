"""Pretrained backbone initialization wiring (torch .pth -> PoseNet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.models.posenet import PoseNetConfig
from pose6d_tpu.models.pretrained import init_posenet_with_pretrained
from pose6d_tpu.models.resnet import ResNet50
from tests.test_resnet_convert import _flax_to_torchvision_keys

IMG = 64


@pytest.fixture(scope="module")
def fake_torchvision_sd():
    """A torchvision-style resnet50 state_dict with recognizable values."""
    model = ResNet50()
    variables = model.init(jax.random.key(7), jnp.zeros((1, IMG, IMG, 3)))
    return _flax_to_torchvision_keys(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
    ), variables


def test_rgb_backbone_initialized(fake_torchvision_sd):
    sd, src = fake_torchvision_sd
    cfg = PoseNetConfig(variant="rgb", img_size=IMG)
    variables = init_posenet_with_pretrained(cfg, jax.random.key(0), sd)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["backbone"]["conv1"]["kernel"]),
        np.asarray(src["params"]["conv1"]["kernel"]),
        atol=1e-7,
    )
    # heads keep fresh init (z-bias 0.5)
    b = np.asarray(variables["params"]["trans_out"]["bias"])
    np.testing.assert_allclose(b, [0, 0, 0.5], atol=1e-7)


def test_rgbd_dual_backbones(fake_torchvision_sd):
    sd, src = fake_torchvision_sd
    cfg = PoseNetConfig(variant="rgbd", img_size=IMG)
    variables = init_posenet_with_pretrained(cfg, jax.random.key(0), sd)
    k_rgb = np.asarray(variables["params"]["rgb_backbone"]["conv1"]["kernel"])
    k_depth = np.asarray(variables["params"]["depth_backbone"]["conv1"]["kernel"])
    assert k_rgb.shape == (7, 7, 3, 64) and k_depth.shape == (7, 7, 1, 64)
    # depth conv1 = rgb conv1 summed over channels (pose_net_rgbd.py:53-59)
    np.testing.assert_allclose(k_depth[..., 0, :], k_rgb.sum(axis=2), atol=1e-6)

    # forward runs with the converted weights
    from pose6d_tpu.models.posenet import PoseNet

    rot, trans = PoseNet(cfg).apply(
        variables,
        jax.random.uniform(jax.random.key(1), (2, IMG, IMG, 3)),
        depth=jnp.zeros((2, IMG, IMG, 1)),
    )
    assert np.isfinite(np.asarray(rot)).all()


def test_trainer_accepts_pretrained(fake_torchvision_sd, tmp_path):
    sd, src = fake_torchvision_sd
    from pose6d_tpu.train.loop import TrainConfig, create_train_state

    cfg = TrainConfig(variant="rgb", img_size=IMG)
    _, _, state = create_train_state(cfg, jax.random.key(0), pretrained_backbone=None)
    model, tx, state_p = create_train_state(cfg, jax.random.key(0))
    # direct state_dict object also accepted by the underlying initializer
    variables = init_posenet_with_pretrained(
        PoseNetConfig(variant="rgb", img_size=IMG), jax.random.key(0), sd
    )
    assert set(variables["params"].keys()) == set(state.params.keys())


def test_pretrained_with_s2d_stem(fake_torchvision_sd):
    # stem_s2d folds the converted 7x7 conv1 into the exactly-equivalent
    # [4,4,4C,O] space-to-depth kernel; forward must match the 7x7 variant
    sd, src = fake_torchvision_sd
    cfg_s2d = PoseNetConfig(variant="rgb", img_size=IMG, stem_s2d=True)
    cfg_std = PoseNetConfig(variant="rgb", img_size=IMG)
    v_s2d = init_posenet_with_pretrained(cfg_s2d, jax.random.key(0), sd)
    v_std = init_posenet_with_pretrained(cfg_std, jax.random.key(0), sd)
    assert v_s2d["params"]["backbone"]["conv1"]["kernel"].shape == (4, 4, 12, 64)

    from pose6d_tpu.models.posenet import PoseNet

    x = jax.random.uniform(jax.random.key(1), (2, IMG, IMG, 3))
    r1, t1 = PoseNet(cfg_s2d).apply(v_s2d, x)
    r2, t2 = PoseNet(cfg_std).apply(v_std, x)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-4)


def test_pretrained_with_s2d_stem_rgbd(fake_torchvision_sd):
    sd, _ = fake_torchvision_sd
    cfg = PoseNetConfig(variant="rgbd", img_size=IMG, stem_s2d=True)
    variables = init_posenet_with_pretrained(cfg, jax.random.key(0), sd)
    assert variables["params"]["rgb_backbone"]["conv1"]["kernel"].shape == (4, 4, 12, 64)
    assert variables["params"]["depth_backbone"]["conv1"]["kernel"].shape == (4, 4, 4, 64)

    from pose6d_tpu.models.posenet import PoseNet

    rot, _ = PoseNet(cfg).apply(
        variables,
        jax.random.uniform(jax.random.key(1), (2, IMG, IMG, 3)),
        depth=jnp.zeros((2, IMG, IMG, 1)),
    )
    assert np.isfinite(np.asarray(rot)).all()

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
