"""YOLO int8 PTQ (models/yolo/quant.py): folded float forward must equal
the flax YoloV8 eval forward; the int8 forward must track it closely."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8
from pose6d_tpu.models.yolo.quant import (
    fold_yolo,
    quantize_yolo_from_variables,
    yolo_folded_forward,
    yolo_int8_forward,
)

DET = 160


@pytest.fixture(scope="module")
def yolo_and_input():
    cfg = YoloConfig(num_classes=3)
    model = YoloV8(cfg)
    x = jax.random.uniform(jax.random.key(1), (2, DET, DET, 3))
    variables = model.init(jax.random.key(0), x)
    n = [0]

    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path)
        n[0] += 1
        if name.endswith("mean"):
            return 0.05 * jax.random.normal(jax.random.key(n[0]), leaf.shape)
        if name.endswith("var"):
            return 1.0 + jax.random.uniform(jax.random.key(n[0]), leaf.shape)
        return leaf

    bs = jax.tree_util.tree_map_with_path(perturb, variables["batch_stats"])
    return cfg, model, {"params": variables["params"], "batch_stats": bs}, x


def test_folded_forward_matches_flax(yolo_and_input):
    cfg, model, variables, x = yolo_and_input
    ref = model.apply(variables, x, train=False)
    folded = fold_yolo(variables["params"], variables["batch_stats"])
    got = yolo_folded_forward(folded, cfg, x)
    assert len(got) == len(ref) == 3
    for (gb, gc), (rb, rc) in zip(got, ref):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                                   rtol=1e-4, atol=1e-4)


def test_int8_forward_tracks_float(yolo_and_input):
    cfg, model, variables, x = yolo_and_input
    q = quantize_yolo_from_variables(variables, cfg, [x])
    ref = model.apply(variables, x, train=False)
    got = jax.jit(lambda q, x: yolo_int8_forward(q, cfg, x))(q, x)
    for (gb, gc), (rb, rc) in zip(got, ref):
        for g, r in ((gb, rb), (gc, rc)):
            g, r = np.asarray(g).ravel(), np.asarray(r).ravel()
            cos = np.dot(g, r) / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-12)
            assert cos > 0.98, cos
    # head output convs stay float
    assert q["head/box0_out"].get("float")
    assert q["backbone/stem"]["w"].dtype == jnp.int8

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
