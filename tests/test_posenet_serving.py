"""Serving-side forward (models/posenet_serving.py) must be numerically
EQUAL to the flax PoseNet eval forward for every variant — this is the seam
that lets the int8 towers (ops/quant.py) replace the flax backbones without
re-deriving the head math. Randomized BN stats keep the folding honest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
from pose6d_tpu.models.posenet_serving import serving_forward

S = 32


def _randomize_stats(variables, seed=7):
    n = [0]

    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path)
        n[0] += 1
        if name.endswith("mean"):
            return 0.1 * jax.random.normal(jax.random.key(seed + n[0]), leaf.shape)
        if name.endswith("var"):
            return 1.0 + jax.random.uniform(jax.random.key(seed + n[0]), leaf.shape)
        return leaf

    bs = jax.tree_util.tree_map_with_path(perturb, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": bs}


def _inputs(cfg):
    kw = {"rgb": jax.random.normal(jax.random.key(1), (2, S, S, 3))}
    if cfg.variant == "rgbd":
        kw["depth"] = jax.random.normal(jax.random.key(2), (2, S, S, 1))
    if cfg.variant == "rgbd_geometric":
        kw["depth_raw"] = jax.random.uniform(
            jax.random.key(3), (2, S, S), minval=0.2, maxval=1.5)
    if cfg.uses_camera:
        kw["bbox_center"] = jnp.array([[14.0, 17.0], [3.0, 30.0]])
        kw["camera_matrix"] = jnp.asarray(
            np.broadcast_to(np.array([[300.0, 0, 16], [0, 300, 16], [0, 0, 1]],
                                     np.float32), (2, 3, 3)))
    return kw


@pytest.mark.parametrize(
    "variant,extra",
    [
        ("rgb", {}),
        ("rgb_geometric", {}),
        ("rgb_geometric", {"rot_head_wide": True}),
        ("rgbd", {}),
        ("rgbd", {"fusion_attention": False}),
        ("rgbd", {"rot_head_wide": True}),
        ("rgbd_geometric", {}),
        ("rgbd_geometric", {"rot_head_wide": True}),
    ],
)
def test_serving_forward_matches_flax(variant, extra):
    cfg = PoseNetConfig(variant=variant, img_size=S, **extra)
    model = PoseNet(cfg)
    kw = _inputs(cfg)
    variables = _randomize_stats(model.init(jax.random.key(0), **kw))
    rot_ref, trans_ref = model.apply(variables, **kw)
    rot, trans = serving_forward(variables, cfg, **kw)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(rot_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(trans_ref),
                               rtol=1e-4, atol=1e-5)


def test_serving_forward_int8_towers_track_float():
    """With quantized towers the serving forward stays close to float —
    cosine similarity on the pre-normalization head outputs."""
    from pose6d_tpu.ops.quant import quantize_resnet_from_variables

    cfg = PoseNetConfig(variant="rgbd", img_size=S)
    model = PoseNet(cfg)
    kw = _inputs(cfg)
    variables = _randomize_stats(model.init(jax.random.key(0), **kw))
    rot_f, trans_f = serving_forward(variables, cfg, **kw)

    def tower_vars(name):
        return {"params": variables["params"][name],
                "batch_stats": variables["batch_stats"][name]}

    q = {
        "rgb_backbone": quantize_resnet_from_variables(
            tower_vars("rgb_backbone"), [kw["rgb"]]),
        "depth_backbone": quantize_resnet_from_variables(
            tower_vars("depth_backbone"), [kw["depth"]]),
    }
    rot_q, trans_q = serving_forward(variables, cfg, quantized=q, **kw)
    assert np.all(np.isfinite(np.asarray(rot_q)))
    # unit quats: dot product is the cosine; random-weight nets amplify
    # PTQ noise vs trained ones, so the gate here is loose — the accuracy
    # gate on trained weights lives in the e2e eval
    dots = np.abs(np.sum(np.asarray(rot_q) * np.asarray(rot_f), axis=-1))
    assert np.all(dots > 0.9), dots

def test_serving_forward_folded_f32_exact():
    """Prepared folded trees (the fold_backbones serving mode) at f32 are
    the same numerics as the on-the-fly folded float path."""
    from pose6d_tpu.ops.quant import fold_bn_resnet

    cfg = PoseNetConfig(variant="rgbd", img_size=S)
    model = PoseNet(cfg)
    kw = _inputs(cfg)
    variables = _randomize_stats(model.init(jax.random.key(0), **kw))
    rot_f, trans_f = serving_forward(variables, cfg, **kw)

    fd = {}
    for name in ("rgb_backbone", "depth_backbone"):
        tree = fold_bn_resnet(variables["params"][name],
                              variables["batch_stats"][name])
        fd[name] = {"tree": jax.tree.map(jnp.asarray, tree)}
    rot, trans = serving_forward(variables, cfg, folded=fd, **kw)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(rot_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(trans_f),
                               rtol=1e-5, atol=1e-6)


def test_serving_forward_folded_bf16_tracks_float():
    """The folded bf16 serving mode (bf16 activations/weights, f32 MXU
    accumulation) stays within the bf16 envelope of the float forward."""
    from pose6d_tpu.ops.quant import fold_bn_resnet

    cfg = PoseNetConfig(variant="rgb", img_size=S)
    model = PoseNet(cfg)
    kw = _inputs(cfg)
    variables = _randomize_stats(model.init(jax.random.key(0), **kw))
    rot_f, trans_f = serving_forward(variables, cfg, **kw)

    tree = fold_bn_resnet(variables["params"]["backbone"],
                          variables["batch_stats"]["backbone"])
    fd = {"backbone": {
        "tree": {k: {"w": jnp.asarray(v["w"], jnp.bfloat16),
                     "b": jnp.asarray(v["b"], jnp.float32)}
                 for k, v in tree.items()}}}
    rot, trans = serving_forward(variables, cfg, folded=fd,
                                 compute_dtype=jnp.bfloat16, **kw)
    dots = np.abs(np.sum(np.asarray(rot) * np.asarray(rot_f), axis=-1))
    assert np.all(dots > 0.99), dots
    np.testing.assert_allclose(np.asarray(trans), np.asarray(trans_f),
                               rtol=0.1, atol=0.05)


def test_pipeline_fold_backbones_routes_and_guards():
    """PosePipeline.fold_backbones: folded outputs match the float pipeline
    (f32 compute dtype, no pallas at this size), and the pallas_layer1
    guard rejects non-224 crop sizes."""
    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8

    ycfg = YoloConfig(num_classes=2)
    yolo = YoloV8(ycfg)
    yvars = yolo.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))
    pcfg = PoseNetConfig(variant="rgb", img_size=S)
    pose = PoseNet(pcfg)
    pvars = _randomize_stats(
        pose.init(jax.random.key(1), jnp.zeros((1, S, S, 3))))

    def build():
        return PosePipeline(
            PipelineConfig(variant="rgb", img_size=S, det_size=96,
                           conf_thresh=0.0, compute_dtype=jnp.float32),
            ycfg, yvars, pvars, pcfg)

    frames = np.random.default_rng(0).integers(
        0, 255, size=(2, 96, 96, 3), dtype=np.uint8)
    K = np.broadcast_to(np.array([[100.0, 0, 48], [0, 100, 48], [0, 0, 1]],
                                 np.float32), (2, 3, 3))
    out_f = build()(frames, K)
    out_folded = build().fold_backbones()(frames, K)
    np.testing.assert_allclose(np.asarray(out_folded["rotation"]),
                               np.asarray(out_f["rotation"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_folded["translation"]),
                               np.asarray(out_f["translation"]),
                               rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError):
        build().fold_backbones(pallas_layer1=True)  # img_size != 224


# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
