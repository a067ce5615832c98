"""YOLO weight converter: round-trip consistency + structural match.

The ultralytics package is absent here, so the test builds a synthetic
state_dict by inverse-mapping our own initialized parameters, then converts
it back and checks tree-equality plus forward-output equality — validating
layout transposes and name wiring in both directions.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pose6d_tpu.models.yolo.convert import (
    flax_to_ultralytics_keys,
    ultralytics_yolov8_to_flax,
)
from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8


def test_round_trip_and_forward_equal():
    cfg = YoloConfig(num_classes=13)
    model = YoloV8(cfg)
    x = jax.random.uniform(jax.random.key(2), (1, 160, 160, 3))
    variables = model.init(jax.random.key(0), x)
    # perturb batch_stats so stats conversion is actually exercised
    stats = jax.tree.map(lambda a: a + 0.1, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    torch_style = flax_to_ultralytics_keys(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
        cfg,
    )
    # keys look like ultralytics ("0.conv.weight", "22.cv2.0.2.weight", ...)
    assert "0.conv.weight" in torch_style
    assert "22.cv2.0.2.bias" in torch_style
    assert torch_style["0.conv.weight"].shape[2:] == (3, 3)  # [O, I, kh, kw]

    params2, stats2 = ultralytics_yolov8_to_flax(torch_style, cfg)
    variables2 = {"params": params2, "batch_stats": stats2}

    # tree equality
    flat1 = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat2 = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(params2)[0]
    )
    assert len(flat1) == len(flat2)
    for path, v in flat1:
        k = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(v), flat2[k], atol=1e-6, err_msg=k)

    out1 = model.apply(variables, x)
    out2 = model.apply(variables2, x)
    for (b1, c1), (b2, c2) in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


def test_model_prefix_stripping():
    cfg = YoloConfig(num_classes=13)
    model = YoloV8(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 160, 160, 3)))
    base = flax_to_ultralytics_keys(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
        cfg,
    )
    prefixed = {f"model.model.{k}": v for k, v in base.items()}
    params, stats = ultralytics_yolov8_to_flax(prefixed, cfg)
    np.testing.assert_allclose(
        params["backbone"]["stem"]["conv"]["kernel"],
        np.asarray(variables["params"]["backbone"]["stem"]["conv"]["kernel"]),
    )

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
