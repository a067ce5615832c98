"""YOLO detection loss: CIoU, TAL assignment, full loss gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from pose6d_tpu.models.yolo.decode import make_anchors
from pose6d_tpu.models.yolo.loss import ciou_xyxy, detection_loss, tal_assign


def test_ciou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    np.testing.assert_allclose(float(ciou_xyxy(a, a)[0]), 1.0, atol=1e-6)
    b = jnp.asarray([[100.0, 100, 110, 110]])
    assert float(ciou_xyxy(a, b)[0]) < 0.0  # disjoint + far -> negative


def test_ciou_partial_overlap_below_iou():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[5.0, 0, 15, 10]])
    iou = 50.0 / 150.0
    c = float(ciou_xyxy(a, b)[0])
    assert c < iou  # penalties reduce below plain IoU
    assert c > iou - 0.2


def _toy_scene(A_img=64, nc=3):
    """8x8 anchor grid at stride 8 (64px image), one gt box."""
    anchors, strides = make_anchors((A_img, A_img), (8,))
    A = anchors.shape[0]
    anchor_px = np.asarray(anchors) * np.asarray(strides)[:, None]
    gt_boxes = np.asarray([[8.0, 8.0, 40.0, 40.0]], np.float32)
    gt_labels = np.asarray([1], np.int32)
    gt_mask = np.asarray([True])
    # predictions: every anchor predicts a box centered on itself, 16px square
    pred_boxes = np.concatenate([anchor_px - 8.0, anchor_px + 8.0], axis=-1).astype(np.float32)
    pred_scores = np.full((A, nc), 0.3, np.float32)
    return anchors, strides, anchor_px, pred_boxes, pred_scores, gt_boxes, gt_labels, gt_mask


def test_tal_assign_fg_inside_gt():
    anchors, strides, anchor_px, pred_boxes, pred_scores, gt_boxes, gt_labels, gt_mask = _toy_scene()
    out = tal_assign(
        jnp.asarray(pred_scores), jnp.asarray(pred_boxes), jnp.asarray(anchor_px),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_mask),
    )
    fg = np.asarray(out["fg"])
    assert fg.sum() > 0
    # every foreground anchor center lies inside the gt box
    inside = (
        (anchor_px[:, 0] > 8) & (anchor_px[:, 0] < 40)
        & (anchor_px[:, 1] > 8) & (anchor_px[:, 1] < 40)
    )
    assert (fg <= inside).all()
    # targets carry the gt class only
    ts = np.asarray(out["scores"])
    assert (ts[fg][:, 1] > 0).all()
    assert np.allclose(ts[fg][:, 0], 0) and np.allclose(ts[fg][:, 2], 0)
    # assigned boxes equal the gt
    fg_boxes = np.asarray(out["boxes"])[fg]
    np.testing.assert_allclose(fg_boxes, np.broadcast_to(gt_boxes[0], fg_boxes.shape), atol=1e-5)


def test_tal_assign_no_gt():
    anchors, strides, anchor_px, pred_boxes, pred_scores, gt_boxes, gt_labels, _ = _toy_scene()
    out = tal_assign(
        jnp.asarray(pred_scores), jnp.asarray(pred_boxes), jnp.asarray(anchor_px),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray([False]),
    )
    assert int(np.asarray(out["fg"]).sum()) == 0
    assert float(np.asarray(out["scores"]).sum()) == 0.0


def test_detection_loss_finite_and_grad():
    anchors, strides, anchor_px, pred_boxes, pred_scores, gt_boxes, gt_labels, gt_mask = _toy_scene()
    A = pred_boxes.shape[0]
    reg_max = 16
    rng = np.random.default_rng(0)
    box_logits = jnp.asarray(rng.normal(size=(1, A, 4 * reg_max)).astype(np.float32))
    cls_logits = jnp.asarray(rng.normal(size=(1, A, 3)).astype(np.float32) - 2)

    def loss_fn(bl, cl):
        out = detection_loss(
            bl, cl, jnp.asarray(pred_boxes)[None], anchors, strides,
            jnp.asarray(gt_boxes)[None], jnp.asarray(gt_labels)[None],
            jnp.asarray(gt_mask)[None], reg_max,
        )
        return out["total"], out

    (total, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        box_logits, cls_logits
    )
    assert np.isfinite(float(total))
    assert int(out["num_fg"]) > 0
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_detection_loss_empty_image():
    anchors, strides, anchor_px, pred_boxes, _, gt_boxes, gt_labels, _ = _toy_scene()
    A = pred_boxes.shape[0]
    box_logits = jnp.zeros((1, A, 64))
    cls_logits = jnp.zeros((1, A, 3))
    out = detection_loss(
        box_logits, cls_logits, jnp.asarray(pred_boxes)[None], anchors, strides,
        jnp.asarray(gt_boxes)[None], jnp.asarray(gt_labels)[None],
        jnp.asarray([[False]]), 16,
    )
    assert np.isfinite(float(out["total"]))
    assert int(out["num_fg"]) == 0
    assert float(out["box"]) == 0.0 and float(out["dfl"]) == 0.0


def test_ema_update_ramp():
    import jax.numpy as jnp

    from pose6d_tpu.models.yolo.train import ema_update

    ema = {"w": jnp.ones(4)}
    params = {"w": jnp.zeros(4)}
    # step 1: d ~ 0.9999 * (1 - e^-0.0005) ~ 5e-5 -> ema moves almost to params
    out1 = ema_update(ema, params, jnp.asarray(1))
    assert float(out1["w"][0]) < 0.001
    # large step: d ~ 0.9999 -> ema barely moves
    out2 = ema_update(ema, params, jnp.asarray(100000))
    assert float(out2["w"][0]) > 0.999
