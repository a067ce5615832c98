"""PoseNet variants: shape checks, variant semantics, jit-ability.

The analogue of the reference's __main__ smoke blocks (pose_net_rgb.py:68-72,
pose_net_rgbd.py:149-156, pose_net_rgbd_geometric.py:88-98), as real tests.
Uses a small image size to keep CPU runtime low — the nets are fully
convolutional up to the pooled feature, so shapes remain valid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig

IMG = 64  # small for CPU test speed


def _init_and_apply(variant, batch=2, img=IMG, **inputs):
    cfg = PoseNetConfig(variant=variant, img_size=img)
    model = PoseNet(cfg)
    rgb = jax.random.normal(jax.random.key(1), (batch, img, img, 3))
    variables = model.init(jax.random.key(0), rgb, **inputs)
    rot, trans = model.apply(variables, rgb, **inputs)
    return variables, rot, trans


def test_rgb_shapes_and_unit_quat():
    _, rot, trans = _init_and_apply("rgb")
    assert rot.shape == (2, 4) and trans.shape == (2, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rot), axis=-1), 1.0, atol=1e-5)


def test_rgb_trans_bias_init_z():
    # translation z-bias initialized to 0.5 (reference pose_net_rgb.py:53-54)
    variables, _, trans = _init_and_apply("rgb")
    b = np.asarray(variables["params"]["trans_out"]["bias"])
    np.testing.assert_allclose(b, [0.0, 0.0, 0.5], atol=1e-7)


def test_rgb_geometric_pinhole_translation():
    img = IMG
    K = jnp.asarray(
        np.tile(np.array([[[500.0, 0, 32], [0, 500.0, 32], [0, 0, 1]]], np.float32), (2, 1, 1))
    )
    center = jnp.asarray(np.array([[32.0, 32.0], [10.0, 50.0]], np.float32))
    _, rot, trans = _init_and_apply("rgb_geometric", bbox_center=center, camera_matrix=K)
    assert rot.shape == (2, 4) and trans.shape == (2, 3)
    # X/Y must satisfy the pinhole relation exactly given predicted Z
    t = np.asarray(trans)
    for i in range(2):
        u, v = np.asarray(center)[i]
        np.testing.assert_allclose(t[i, 0], (u - 32.0) * t[i, 2] / 500.0, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(t[i, 1], (v - 32.0) * t[i, 2] / 500.0, rtol=1e-5, atol=1e-7)


def test_rgb_geometric_fallback_without_camera():
    _, _, trans = _init_and_apply("rgb_geometric")
    t = np.asarray(trans)
    np.testing.assert_allclose(t[:, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(t[:, 1], 0.0, atol=1e-7)


def test_rgbd_shapes():
    depth = jnp.zeros((2, IMG, IMG, 1))
    _, rot, trans = _init_and_apply("rgbd", depth=depth)
    assert rot.shape == (2, 4) and trans.shape == (2, 3)


def test_rgbd_geometric_depth_sampling():
    img = IMG
    cfg = PoseNetConfig(variant="rgbd_geometric", img_size=img)
    model = PoseNet(cfg)
    rgb = jax.random.normal(jax.random.key(1), (2, img, img, 3))
    depth_raw = np.zeros((2, img, img), np.float32)
    depth_raw[0, 20, 30] = 0.9  # (v=20, u=30)
    depth_raw[1, 5, 5] = 0.005  # invalid -> fallback 0.5
    center = jnp.asarray(np.array([[30.0, 20.0], [5.0, 5.0]], np.float32))
    K = jnp.asarray(
        np.tile(np.array([[[400.0, 0, 32], [0, 400.0, 32], [0, 0, 1]]], np.float32), (2, 1, 1))
    )
    variables = model.init(
        jax.random.key(0), rgb, depth_raw=jnp.asarray(depth_raw), bbox_center=center, camera_matrix=K
    )
    rot, trans = model.apply(
        variables, rgb, depth_raw=jnp.asarray(depth_raw), bbox_center=center, camera_matrix=K
    )
    t = np.asarray(trans)
    np.testing.assert_allclose(t[0, 2], 0.9, atol=1e-6)
    np.testing.assert_allclose(t[1, 2], 0.5, atol=1e-6)  # invalid-depth fallback
    np.testing.assert_allclose(t[0, 0], (30.0 - 32.0) * 0.9 / 400.0, rtol=1e-5)
    np.testing.assert_allclose(t[0, 1], (20.0 - 32.0) * 0.9 / 400.0, rtol=1e-5)


def test_rgbd_geometric_fallback():
    _, _, trans = _init_and_apply("rgbd_geometric")
    np.testing.assert_allclose(np.asarray(trans), np.tile([[0, 0, 0.5]], (2, 1)), atol=1e-7)


def test_train_mode_with_dropout_and_bn():
    cfg = PoseNetConfig(variant="rgb", img_size=IMG)
    model = PoseNet(cfg)
    rgb = jax.random.normal(jax.random.key(1), (4, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), rgb)
    out, updates = model.apply(
        variables,
        rgb,
        train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    rot, trans = out
    assert rot.shape == (4, 4)
    assert "batch_stats" in updates


def test_jit_forward():
    cfg = PoseNetConfig(variant="rgb", img_size=IMG)
    model = PoseNet(cfg)
    rgb = jax.random.normal(jax.random.key(1), (2, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), rgb)
    f = jax.jit(lambda v, x: model.apply(v, x))
    rot, trans = f(variables, rgb)
    assert rot.shape == (2, 4)


def test_resnet50_param_count():
    # torchvision resnet50 backbone (without fc) has ~23.5M params
    from pose6d_tpu.models.resnet import ResNet50

    m = ResNet50()
    variables = m.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert 23.4e6 < n < 23.6e6, n


def test_rot_head_wide_ablation_structure():
    """rot_head_wide swaps the geometric rotation head to the rgb-style
    2048/1024/512 stack (ablation for the narrow-head rotation plateau,
    PARITY_RESULTS.md)."""
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig

    m = PoseNet(PoseNetConfig(variant="rgbd_geometric", img_size=32,
                              rot_head_wide=True))
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    p = v["params"]
    assert p["rot_dense0"]["kernel"].shape == (2048, 2048)
    assert p["rot_dense1"]["kernel"].shape == (2048, 1024)
    assert p["rot_dense2"]["kernel"].shape == (1024, 512)
    assert p["rot_out"]["kernel"].shape == (512, 4)


def test_rgbd_widehead_and_noattn_ablations():
    """rgbd ablations: rot_head_wide swaps the fused GELU 512/256 rot head
    for the rgb-style 2048/1024/512 BN stack; fusion_attention=False drops
    the CrossModalAttention params and changes the fused function."""
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig

    rgb = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    depth = jax.random.normal(jax.random.key(2), (2, 32, 32, 1))

    m = PoseNet(PoseNetConfig(variant="rgbd", img_size=32, rot_head_wide=True))
    v = m.init(jax.random.key(0), rgb, depth=depth)
    p = v["params"]
    # wide head hangs off the 1024-dim fused features
    assert p["rot_dense0"]["kernel"].shape == (1024, 2048)
    assert p["rot_dense2"]["kernel"].shape == (1024, 512)
    assert p["rot_out"]["kernel"].shape == (512, 4)
    # translation head unchanged (fused GELU stack)
    assert p["trans_dense0"]["kernel"].shape == (1024, 512)
    rot, trans = m.apply(v, rgb, depth=depth)
    assert rot.shape == (2, 4) and trans.shape == (2, 3)

    m2 = PoseNet(PoseNetConfig(variant="rgbd", img_size=32, fusion_attention=False))
    v2 = m2.init(jax.random.key(0), rgb, depth=depth)
    assert "cross_attention" not in v2["params"]
    rot2, trans2 = m2.apply(v2, rgb, depth=depth)
    assert np.all(np.isfinite(np.asarray(rot2))) and rot2.shape == (2, 4)


def test_rgbd_attn_zero_init_starts_at_concat_baseline():
    """attn_zero_init: the CrossModalAttention out_proj kernel is zeros, so
    at initialization the attention residual is exactly identity — the rgbd
    forward must MATCH the no-attention (concat fusion) ablation given the
    same downstream parameters. Shapes are unchanged (checkpoint/converter
    compatible)."""
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig

    rgb = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    depth = jax.random.normal(jax.random.key(2), (2, 32, 32, 1))

    m = PoseNet(PoseNetConfig(variant="rgbd", img_size=32, attn_zero_init=True))
    v = m.init(jax.random.key(0), rgb, depth=depth)
    p = v["params"]
    assert np.all(np.asarray(p["cross_attention"]["out_proj"]["kernel"]) == 0)
    # same param SHAPES as the reference init (golden/converter compatible)
    m_ref = PoseNet(PoseNetConfig(variant="rgbd"))
    v_ref = m_ref.init(jax.random.key(0), rgb, depth=depth)
    assert jax.tree.structure(v) == jax.tree.structure(v_ref)

    rot, trans = m.apply(v, rgb, depth=depth)
    # graft the non-attention params into the noattn architecture: outputs
    # must be identical because the zero-init residual contributes nothing
    m_na = PoseNet(PoseNetConfig(variant="rgbd", fusion_attention=False))
    p_na = {k: p[k] for k in p if k != "cross_attention"}
    v_na = {"params": p_na, "batch_stats": v["batch_stats"]}
    rot_na, trans_na = m_na.apply(v_na, rgb, depth=depth)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(rot_na), atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(trans_na), atol=1e-6)

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow


def test_rgb_geometric_z_diagnosis_arms():
    """The two rgb_geometric z-pathway diagnosis arms (VERDICT round-4 #5):
    z_from_backbone drops the separate Z-CNN and regresses z from the
    ResNet50 features through the rgb-translation-head shape;
    z_backbone_wide doubles the Z-CNN's channels. Both keep the pinhole
    X/Y derivation and unit-quaternion contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig

    rgb = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    center = jnp.array([[16.0, 16.0], [10.0, 20.0]])
    K = jnp.broadcast_to(jnp.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]]), (2, 3, 3))

    # arm (b): z from the backbone features — no z_backbone scope at all,
    # z head shaped like the rgb variant's translation head
    m = PoseNet(PoseNetConfig(variant="rgb_geometric", img_size=32,
                              z_from_backbone=True))
    v = m.init(jax.random.key(0), rgb, bbox_center=center, camera_matrix=K)
    p = v["params"]
    assert "z_backbone" not in p
    assert p["z_dense0"]["kernel"].shape == (2048, 2048)
    assert p["z_out"]["kernel"].shape == (512, 1)
    rot, trans = m.apply(v, rgb, bbox_center=center, camera_matrix=K)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rot), axis=-1), 1.0,
                               rtol=1e-5)
    # pinhole contract: x = (u - cx) * z / fx
    t = np.asarray(trans)
    np.testing.assert_allclose(
        t[:, 0], (np.asarray(center)[:, 0] - 16.0) * t[:, 2] / 30.0, rtol=1e-5,
        atol=1e-6)

    # arm (a): wide Z-CNN — channels doubled, z MLP widened
    m2 = PoseNet(PoseNetConfig(variant="rgb_geometric", img_size=32,
                               z_backbone_wide=True))
    v2 = m2.init(jax.random.key(0), rgb, bbox_center=center, camera_matrix=K)
    p2 = v2["params"]
    assert p2["z_backbone"]["conv0"]["kernel"].shape[-1] == 64
    assert p2["z_backbone"]["conv3"]["kernel"].shape[-1] == 512
    assert p2["z_dense0"]["kernel"].shape == (512, 256)
    rot2, trans2 = m2.apply(v2, rgb, bbox_center=center, camera_matrix=K)
    assert rot2.shape == (2, 4) and trans2.shape == (2, 3)
