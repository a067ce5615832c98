"""int8 PTQ serving path (ops/quant.py): BN folding must be numerically
exact vs the eval-mode flax ResNet50, and the int8 forward must stay close
to the float forward (per-channel symmetric weights + calibrated static
activation scales)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.models.resnet import ResNet50
from pose6d_tpu.ops.quant import (
    calibrate_act_scales,
    fold_bn_resnet,
    folded_resnet50_forward,
    int8_resnet50_forward,
    quantize_folded,
    quantize_resnet_from_variables,
)


@pytest.fixture(scope="module")
def resnet_and_input():
    model = ResNet50()
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    # randomize BN running stats so folding is non-trivial (init is
    # mean=0/var=1, which folding would pass through untouched)
    leaves = []

    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path)
        if name.endswith("mean"):
            return 0.1 * jax.random.normal(jax.random.key(len(leaves)), leaf.shape)
        if name.endswith("var"):
            return 1.0 + jax.random.uniform(jax.random.key(len(leaves)), leaf.shape)
        return leaf

    bs = jax.tree_util.tree_map_with_path(perturb, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    return model, variables, x


def test_fold_bn_matches_flax_eval(resnet_and_input):
    model, variables, x = resnet_and_input
    ref = model.apply(variables, x, train=False)
    folded = fold_bn_resnet(variables["params"], variables["batch_stats"])
    got = folded_resnet50_forward(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_forward_tracks_float(resnet_and_input):
    model, variables, x = resnet_and_input
    folded = fold_bn_resnet(variables["params"], variables["batch_stats"])
    scales = calibrate_act_scales(folded, [x])
    q = quantize_folded(folded, scales)
    f = np.asarray(folded_resnet50_forward(folded, x))
    g = np.asarray(int8_resnet50_forward(q, x))
    # random-weight nets amplify quantization noise vs trained ones; the
    # serving-accuracy gate lives in the e2e eval — here we pin that the
    # int8 graph computes the same FUNCTION to quantization tolerance
    cos = np.sum(f * g) / (np.linalg.norm(f) * np.linalg.norm(g) + 1e-12)
    assert cos > 0.99, cos
    rel = np.linalg.norm(f - g) / (np.linalg.norm(f) + 1e-12)
    assert rel < 0.15, rel


def test_one_call_ptq_and_dtypes(resnet_and_input):
    model, variables, x = resnet_and_input
    q = quantize_resnet_from_variables(variables, [x])
    assert q["conv1"]["w"].dtype == jnp.int8
    assert q["conv1"]["s"].ndim == 1 and q["conv1"]["b"].ndim == 1
    out = int8_resnet50_forward(q, x, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16 and out.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_int8_forward_jits(resnet_and_input):
    model, variables, x = resnet_and_input
    q = quantize_resnet_from_variables(variables, [x])
    f = jax.jit(lambda q, x: int8_resnet50_forward(q, x))
    a = np.asarray(f(q, x))
    b = np.asarray(int8_resnet50_forward(q, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
