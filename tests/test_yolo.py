"""YOLOv8: graph shapes, parameter count, decode + NMS semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.models.yolo.decode import (
    batched_nms,
    box_iou_xyxy,
    decode_outputs,
    dfl_expectation,
    make_anchors,
    nms_fixed,
)
from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8


@pytest.fixture(scope="module")
def yolo_n():
    cfg = YoloConfig(num_classes=13)
    model = YoloV8(cfg)
    x = jnp.zeros((1, 160, 160, 3))
    variables = model.init(jax.random.key(0), x)
    return cfg, model, variables


def test_forward_shapes(yolo_n):
    cfg, model, variables = yolo_n
    x = jax.random.uniform(jax.random.key(1), (2, 160, 160, 3))
    outs = model.apply(variables, x)
    assert len(outs) == 3
    for (box, cls), s in zip(outs, cfg.strides):
        assert box.shape == (2, 160 // s, 160 // s, 4 * cfg.reg_max)
        assert cls.shape == (2, 160 // s, 160 // s, cfg.num_classes)


def test_param_count_matches_yolov8n(yolo_n):
    # ultralytics yolov8n (nc=80) has 3.157M params; with nc=13 slightly
    # fewer (smaller cls convs). Expect ~2.9-3.2M.
    _, _, variables = yolo_n
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 2.8e6 < n < 3.3e6, n


def test_make_anchors():
    anchors, strides = make_anchors((160, 160), (8, 16, 32))
    n = (160 // 8) ** 2 + (160 // 16) ** 2 + (160 // 32) ** 2
    assert anchors.shape == (n, 2) and strides.shape == (n,)
    # first anchor is the (0.5, 0.5) cell center at stride 8
    np.testing.assert_allclose(np.asarray(anchors[0]), [0.5, 0.5])
    assert float(strides[0]) == 8.0 and float(strides[-1]) == 32.0


def test_dfl_expectation_onehot():
    # logits strongly peaked at bin k decode to distance k
    reg_max = 16
    logits = np.full((1, 4 * reg_max), -20.0, np.float32)
    for side, k in enumerate([0, 3, 7, 15]):
        logits[0, side * reg_max + k] = 20.0
    out = np.asarray(dfl_expectation(jnp.asarray(logits), reg_max))
    np.testing.assert_allclose(out[0], [0, 3, 7, 15], atol=1e-3)


def test_decode_outputs_geometry(yolo_n):
    cfg, model, variables = yolo_n
    x = jnp.zeros((1, 160, 160, 3))
    outs = model.apply(variables, x)
    boxes, scores = decode_outputs(outs, cfg, (160, 160))
    A = sum((160 // s) ** 2 for s in cfg.strides)
    assert boxes.shape == (1, A, 4)
    assert scores.shape == (1, A, cfg.num_classes)
    assert (np.asarray(scores) >= 0).all() and (np.asarray(scores) <= 1).all()
    b = np.asarray(boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()


def test_box_iou():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou_xyxy(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]]
    )
    scores = np.zeros((4, 2), np.float32)
    scores[0, 0] = 0.9  # best box, class 0
    scores[1, 0] = 0.8  # overlaps box 0, same class -> suppressed
    scores[2, 0] = 0.7  # far away -> kept
    scores[3, 1] = 0.6  # overlaps box 0 but DIFFERENT class -> kept
    out = nms_fixed(boxes, jnp.asarray(scores), max_det=4, pre_topk=4, iou_thresh=0.5)
    kept_scores = sorted(np.asarray(out["scores"])[np.asarray(out["valid"])].tolist())
    np.testing.assert_allclose(kept_scores, [0.6, 0.7, 0.9], atol=1e-6)


def test_nms_conf_threshold():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [50, 50, 60, 60]])
    scores = np.zeros((2, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.1  # below conf 0.25 -> dropped
    out = nms_fixed(boxes, jnp.asarray(scores), max_det=2, pre_topk=2)
    assert int(np.asarray(out["valid"]).sum()) == 1


def test_batched_nms_jit():
    rng = np.random.default_rng(0)
    boxes = jnp.asarray(rng.uniform(0, 100, size=(2, 64, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 10.0)
    scores = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 13)).astype(np.float32))
    f = jax.jit(lambda b, s: batched_nms(b, s, max_det=10, pre_topk=32))
    out = f(boxes, scores)
    assert out["boxes"].shape == (2, 10, 4)
    assert out["valid"].shape == (2, 10)


def test_nms_fixpoint_matches_sequential_greedy():
    # the fixpoint iteration must reproduce exact sequential greedy NMS,
    # including suppression chains (A beats B, B would have beaten C -> C
    # survives because B is gone)
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = 24
        centers = rng.uniform(0, 60, size=(n, 2))
        sizes = rng.uniform(8, 22, size=(n, 2))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=-1)
        scores = np.zeros((n, 1), np.float32)
        scores[:, 0] = np.sort(rng.uniform(0.3, 1.0, n))[::-1]

        out = nms_fixed(
            jnp.asarray(boxes.astype(np.float32)), jnp.asarray(scores),
            max_det=n, pre_topk=n, iou_thresh=0.4, conf_thresh=0.0,
        )
        ours = set(np.round(np.asarray(out["scores"])[np.asarray(out["valid"])], 5))

        # reference: plain python greedy in score order
        iou = np.asarray(box_iou_xyxy(jnp.asarray(boxes, dtype=jnp.float32),
                                      jnp.asarray(boxes, dtype=jnp.float32)))
        order = np.argsort(-scores[:, 0])
        kept = []
        for i in order:
            if all(iou[j, i] < 0.4 for j in kept):
                kept.append(i)
        ref = set(np.round(scores[kept, 0], 5))
        assert ours == ref, (trial, ours, ref)


def test_nms_fixpoint_deep_chain():
    # adversarial suppression chain: boxes in a line, each overlapping only
    # its neighbors, scores strictly decreasing -> greedy keeps every other
    # box. Depth ~n/2 alternations stress the fixpoint iterations.
    n = 16
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 6.0, 0.0, i * 6.0 + 10.0, 10.0]  # 4px overlap w/ next
    scores = np.zeros((n, 1), np.float32)
    scores[:, 0] = np.linspace(1.0, 0.5, n)
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                    max_det=n, pre_topk=n, iou_thresh=0.2, conf_thresh=0.0)
    kept = np.asarray(out["valid"]).sum()
    # greedy keeps boxes 0, 2, 4, ... -> n/2 survivors
    assert int(kept) == n // 2


def test_nms_bounded_fixpoint_matches_exact_on_dense_fields():
    # PipelineConfig.nms_fixpoint_iters=16 trades the 64 serial fixpoint
    # steps for 16 (~1 ms/batch on chip); the contract is exactness for
    # suppression chains up to depth 16. Dense random clusters (the
    # realistic worst case — detector score fields around true objects)
    # must give identical keep sets.
    rng = np.random.default_rng(11)
    for trial in range(10):
        n = 64
        # 8 tight clusters of 8 boxes each: heavy mutual overlap
        centers = np.repeat(rng.uniform(0, 80, size=(8, 2)), 8, axis=0)
        centers += rng.uniform(-4, 4, size=(n, 2))
        sizes = rng.uniform(10, 20, size=(n, 2))
        boxes = jnp.asarray(
            np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=-1).astype(np.float32))
        scores = jnp.asarray(rng.uniform(0.1, 1.0, size=(n, 3)).astype(np.float32))
        exact = nms_fixed(boxes, scores, max_det=n, pre_topk=n,
                          iou_thresh=0.5, conf_thresh=0.0)
        fast = nms_fixed(boxes, scores, max_det=n, pre_topk=n,
                         iou_thresh=0.5, conf_thresh=0.0, fixpoint_iters=16)
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_array_equal(np.asarray(exact[k]),
                                          np.asarray(fast[k]), err_msg=k)


def test_decode_topk_nms_matches_two_step():
    # the fused top-k-before-DFL decode must produce exactly the two-step
    # decode_outputs + batched_nms result (same candidate ranking, same
    # per-anchor DFL decode, same suppression)
    from pose6d_tpu.models.yolo.decode import decode_topk_nms

    cfg = YoloConfig(num_classes=5)
    H, W = 64, 96
    rng = np.random.default_rng(3)
    outputs = []
    for s in cfg.strides:
        shape = (2, H // s, W // s)
        outputs.append((
            jnp.asarray(rng.normal(0, 1.5, shape + (4 * cfg.reg_max,)),
                        jnp.float32),
            jnp.asarray(rng.normal(-2, 2, shape + (cfg.num_classes,)),
                        jnp.float32),
        ))
    kw = dict(max_det=8, pre_topk=32, iou_thresh=0.5, conf_thresh=0.1,
              fixpoint_iters=16)
    boxes, scores = decode_outputs(outputs, cfg, (H, W))
    ref = batched_nms(boxes, scores, **kw)
    got = decode_topk_nms(outputs, cfg, (H, W), **kw)
    for k in ("scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)
    np.testing.assert_allclose(np.asarray(ref["boxes"]),
                               np.asarray(got["boxes"]), atol=1e-4)



def test_nms_top1_fast():
    """max_det=1 fast path: greedy NMS can never suppress the global-argmax
    candidate, so the top-1 decode (no IoU fixpoint, k=1 candidate set) must
    equal slot 0 of the full NMS path — including the conf-threshold
    invalidation."""
    from pose6d_tpu.models.yolo.decode import decode_topk_nms

    cfg = YoloConfig(num_classes=5)
    H, W = 64, 96
    rng = np.random.default_rng(11)
    for trial in range(4):
        outputs = []
        for s in cfg.strides:
            shape = (3, H // s, W // s)
            outputs.append((
                jnp.asarray(rng.normal(0, 1.5, shape + (4 * cfg.reg_max,)),
                            jnp.float32),
                jnp.asarray(rng.normal(-2, 2, shape + (cfg.num_classes,)),
                            jnp.float32),
            ))
        # trial 2 uses a high conf threshold so some frames go invalid
        conf = 0.6 if trial == 2 else 0.1
        kw = dict(pre_topk=32, iou_thresh=0.5, conf_thresh=conf,
                  fixpoint_iters=16)
        full = decode_topk_nms(outputs, cfg, (H, W), max_det=8, **kw)
        fast = decode_topk_nms(outputs, cfg, (H, W), max_det=1, **kw)
        for k in ("scores", "classes", "valid"):
            np.testing.assert_array_equal(
                np.asarray(full[k][:, :1]), np.asarray(fast[k]), err_msg=k)
        np.testing.assert_allclose(np.asarray(full["boxes"][:, :1]),
                                   np.asarray(fast["boxes"]), atol=1e-4)

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
