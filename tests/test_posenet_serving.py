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

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
