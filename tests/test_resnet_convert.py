"""torchvision ResNet50 converter: round-trip + forward equality + depth init."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pose6d_tpu.models.convert import torchvision_resnet50_to_flax, _STAGE_SIZES
from pose6d_tpu.models.resnet import ResNet50


def _flax_to_torchvision_keys(params, stats):
    """Inverse mapping for the test: our tree -> torchvision-style dict."""
    out = {}

    def put_bn(tkey, p, s):
        out[f"{tkey}.weight"] = p["scale"]
        out[f"{tkey}.bias"] = p["bias"]
        out[f"{tkey}.running_mean"] = s["mean"]
        out[f"{tkey}.running_var"] = s["var"]

    out["conv1.weight"] = np.transpose(params["conv1"]["kernel"], (3, 2, 0, 1))
    put_bn("bn1", params["bn1"], stats["bn1"])

    for si, n_blocks in enumerate(_STAGE_SIZES):
        for bi in range(n_blocks):
            fname = f"layer{si + 1}_{bi}"
            tprefix = f"layer{si + 1}.{bi}"
            bp, bs = params[fname], stats[fname]
            for ci in (1, 2, 3):
                out[f"{tprefix}.conv{ci}.weight"] = np.transpose(
                    bp[f"conv{ci}"]["kernel"], (3, 2, 0, 1)
                )
                put_bn(f"{tprefix}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample_conv" in bp:
                out[f"{tprefix}.downsample.0.weight"] = np.transpose(
                    bp["downsample_conv"]["kernel"], (3, 2, 0, 1)
                )
                put_bn(f"{tprefix}.downsample.1", bp["downsample_bn"], bs["downsample_bn"])
    return out


def test_round_trip_forward_equal():
    model = ResNet50()
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    stats = jax.tree.map(lambda a: a + 0.05, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    sd = _flax_to_torchvision_keys(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
    )
    assert "layer4.2.conv3.weight" in sd
    assert "layer1.0.downsample.0.weight" in sd

    params2, stats2 = torchvision_resnet50_to_flax(sd)
    out1 = model.apply(variables, x)
    out2 = model.apply({"params": params2, "batch_stats": stats2}, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_depth_branch_conv1_sum():
    # reference pose_net_rgbd.py:53-59: depth conv1 = RGB conv1 summed over
    # input channels
    model = ResNet50()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    sd = _flax_to_torchvision_keys(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
    )
    params_d, _ = torchvision_resnet50_to_flax(sd, sum_conv1_to_1ch=True)
    k3 = np.asarray(variables["params"]["conv1"]["kernel"])  # [7, 7, 3, 64]
    k1 = params_d["conv1"]["kernel"]  # [7, 7, 1, 64]
    assert k1.shape == (7, 7, 1, 64)
    np.testing.assert_allclose(k1[..., 0, :], k3.sum(axis=2), atol=1e-6)

    # and the 1-channel backbone accepts it
    model1 = ResNet50(in_channels=1)
    v1 = model1.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    shapes_ok = jax.tree.map(
        lambda a, b: a.shape == b.shape, v1["params"],
        jax.tree.map(jnp.asarray, params_d),
    )
    assert all(jax.tree.leaves(shapes_ok))


def test_prefix_support():
    model = ResNet50()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    sd = _flax_to_torchvision_keys(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
    )
    prefixed = {f"backbone.0.{k}": v for k, v in sd.items()}
    params2, _ = torchvision_resnet50_to_flax(prefixed, prefix="backbone.0.")
    np.testing.assert_allclose(
        params2["conv1"]["kernel"],
        np.asarray(variables["params"]["conv1"]["kernel"]),
    )


def test_space_to_depth_stem_exact_equivalence(rng):
    # the s2d 4x4/s1 stem with transformed weights must reproduce the
    # 7x7/s2 stem bit-for-bit (up to fp assoc noise)
    from pose6d_tpu.models.convert import s2d_conv1_weights

    w7 = rng.normal(scale=0.1, size=(7, 7, 3, 8)).astype(np.float32)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w7), window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    w2 = s2d_conv1_weights(w7)
    B, H, W, C = x.shape
    x2 = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(B, H // 2, W // 2, 4 * C)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x2), jnp.asarray(w2), window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_resnet_s2d_stem_runs():
    from pose6d_tpu.models.resnet import ResNet50

    m = ResNet50(stem_space_to_depth=True)
    variables = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assert variables["params"]["conv1"]["kernel"].shape == (4, 4, 12, 64)
    out = m.apply(variables, jax.random.uniform(jax.random.key(1), (2, 64, 64, 3)))
    assert out.shape == (2, 2048)

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
