"""YOLOv8 detection training loss: TAL assignment + CIoU + DFL + BCE.

The reference's entire detector training loop lives inside ultralytics
(scripts/training/train_yolo.py:44-57). This module owns it natively:
  - Task-Aligned Assigner: align = score^alpha * IoU^beta (alpha=0.5,
    beta=6), top-10 candidates among anchors whose centers fall inside the
    gt box, conflicts resolved by max IoU, targets normalized per-gt.
  - Losses: BCE on task-aligned soft class targets, CIoU box loss, and
    distribution-focal loss over the two bins bracketing each target
    distance. Gains follow ultralytics defaults: box 7.5, cls 0.5, dfl 1.5.

Everything is static-shape (gt boxes padded to max_gt with a mask) and
vmapped over the batch — one jit for the whole loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .decode import box_iou_xyxy

ALPHA = 0.5
BETA = 6.0
TOPK = 10
BOX_GAIN = 7.5
CLS_GAIN = 0.5
DFL_GAIN = 1.5
EPS = 1e-9


def ciou_xyxy(a: jax.Array, b: jax.Array) -> jax.Array:
    """Complete IoU between matched box pairs [..., 4] -> [...]."""
    ax1, ay1, ax2, ay2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx1, by1, bx2, by2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    aw, ah = ax2 - ax1, ay2 - ay1
    bw, bh = bx2 - bx1, by2 - by1

    inter_w = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    inter_h = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = inter_w * inter_h
    union = aw * ah + bw * bh - inter
    iou = inter / jnp.maximum(union, EPS)

    # enclosing box diagonal
    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    ch = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    c2 = cw * cw + ch * ch + EPS
    # center distance
    rho2 = ((ax1 + ax2 - bx1 - bx2) ** 2 + (ay1 + ay2 - by1 - by2) ** 2) / 4.0
    # aspect-ratio consistency
    v = (4.0 / jnp.pi**2) * (
        jnp.arctan(bw / jnp.maximum(bh, EPS)) - jnp.arctan(aw / jnp.maximum(ah, EPS))
    ) ** 2
    alpha = v / jnp.maximum(1.0 - iou + v, EPS)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def tal_assign(
    pred_scores: jax.Array,  # [A, nc] sigmoid probabilities
    pred_boxes: jax.Array,  # [A, 4] xyxy pixels
    anchor_pts: jax.Array,  # [A, 2] anchor centers in PIXELS
    gt_boxes: jax.Array,  # [M, 4] xyxy pixels (padded)
    gt_labels: jax.Array,  # [M] int
    gt_mask: jax.Array,  # [M] bool
) -> dict:
    """Task-aligned assignment for one image.

    Returns target_boxes [A, 4], target_scores [A, nc], fg_mask [A].
    """
    A = pred_boxes.shape[0]
    M = gt_boxes.shape[0]
    nc = pred_scores.shape[-1]

    # candidates: anchor center strictly inside the gt box
    x, y = anchor_pts[:, 0], anchor_pts[:, 1]
    inside = (
        (x[None, :] > gt_boxes[:, 0:1])
        & (x[None, :] < gt_boxes[:, 2:3])
        & (y[None, :] > gt_boxes[:, 1:2])
        & (y[None, :] < gt_boxes[:, 3:4])
    )  # [M, A]
    inside = inside & gt_mask[:, None]

    # alignment metric
    iou = jnp.clip(box_iou_xyxy(gt_boxes, pred_boxes), 0.0)  # [M, A]
    labels = jnp.clip(gt_labels, 0, nc - 1)
    cls_score = pred_scores[:, labels].T  # [M, A]
    metric = (cls_score**ALPHA) * (iou**BETA)
    metric = jnp.where(inside, metric, 0.0)

    # top-k per gt
    k = min(TOPK, A)
    topk_metric, topk_idx = jax.lax.top_k(metric, k)  # [M, k]
    is_topk = jnp.zeros((M, A), bool)
    rows = jnp.arange(M)[:, None]
    is_topk = is_topk.at[rows, topk_idx].set(topk_metric > EPS)
    pos = is_topk & inside  # [M, A]

    # conflict resolution: anchor claimed by >1 gt goes to the max-IoU gt
    iou_masked = jnp.where(pos, iou, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=0)  # [A]
    fg = jnp.any(pos, axis=0)  # [A]

    tgt_boxes = gt_boxes[best_gt]  # [A, 4]
    tgt_labels = labels[best_gt]  # [A]

    # normalized soft targets: metric * max_iou / max_metric per gt
    pos_after = jnp.zeros((M, A), bool).at[best_gt, jnp.arange(A)].set(fg)
    metric_pos = jnp.where(pos_after, metric, 0.0)
    iou_pos = jnp.where(pos_after, iou, 0.0)
    max_metric = jnp.max(metric_pos, axis=1, keepdims=True)  # [M, 1]
    max_iou = jnp.max(iou_pos, axis=1, keepdims=True)
    norm = metric_pos * max_iou / jnp.maximum(max_metric, EPS)  # [M, A]
    t = jnp.max(norm, axis=0)  # [A]

    tgt_scores = jax.nn.one_hot(tgt_labels, nc) * t[:, None]
    tgt_scores = jnp.where(fg[:, None], tgt_scores, 0.0)
    return {"boxes": tgt_boxes, "scores": tgt_scores, "fg": fg}


def detection_loss(
    box_logits: jax.Array,  # [B, A, 4*reg_max]
    cls_logits: jax.Array,  # [B, A, nc]
    pred_boxes: jax.Array,  # [B, A, 4] decoded xyxy pixels
    anchors: jax.Array,  # [A, 2] stride units
    strides: jax.Array,  # [A]
    gt_boxes: jax.Array,  # [B, M, 4] xyxy pixels
    gt_labels: jax.Array,  # [B, M]
    gt_mask: jax.Array,  # [B, M] bool
    reg_max: int = 16,
) -> dict:
    """Full detection loss for a batch. Returns dict with total + components."""
    pred_scores = jax.nn.sigmoid(cls_logits)
    anchor_px = anchors * strides[:, None]

    assign = jax.vmap(
        lambda s, b, gb, gl, gm: tal_assign(s, b, anchor_px, gb, gl, gm)
    )(pred_scores, pred_boxes, gt_boxes, gt_labels, gt_mask)

    fg = assign["fg"]  # [B, A]
    tgt_scores = assign["scores"]  # [B, A, nc]
    tgt_boxes = assign["boxes"]  # [B, A, 4]

    tgt_sum = jnp.maximum(jnp.sum(tgt_scores), 1.0)

    # classification: BCE with soft targets over ALL anchors
    cls_loss = (
        jnp.sum(
            optax_sigmoid_bce(cls_logits, tgt_scores)
        )
        / tgt_sum
    )

    # box: CIoU on foreground anchors, weighted by target score
    weight = jnp.sum(tgt_scores, axis=-1)  # [B, A]
    ciou = ciou_xyxy(pred_boxes, tgt_boxes)
    box_loss = jnp.sum(jnp.where(fg, (1.0 - ciou) * weight, 0.0)) / tgt_sum

    # DFL: target ltrb = (anchor - x1y1/stride, x2y2/stride - anchor)
    x1y1 = tgt_boxes[..., :2] / strides[None, :, None]
    x2y2 = tgt_boxes[..., 2:] / strides[None, :, None]
    tgt_ltrb = jnp.concatenate([anchors[None] - x1y1, x2y2 - anchors[None]], axis=-1)
    tgt_ltrb = jnp.clip(tgt_ltrb, 0.0, reg_max - 1 - 0.01)  # [B, A, 4]

    tl = jnp.floor(tgt_ltrb).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - tgt_ltrb
    wr = 1.0 - wl
    logits4 = box_logits.reshape(*box_logits.shape[:-1], 4, reg_max)
    logp = jax.nn.log_softmax(logits4, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    dfl = jnp.mean(ce_l * wl + ce_r * wr, axis=-1)  # [B, A]
    dfl_loss = jnp.sum(jnp.where(fg, dfl * weight, 0.0)) / tgt_sum

    total = BOX_GAIN * box_loss + CLS_GAIN * cls_loss + DFL_GAIN * dfl_loss
    return {
        "total": total,
        "box": box_loss,
        "cls": cls_loss,
        "dfl": dfl_loss,
        "num_fg": jnp.sum(fg),
    }


def optax_sigmoid_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise sigmoid binary cross-entropy (kept local: no label
    smoothing, matching ultralytics BCEWithLogitsLoss defaults)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1.0 - targets) * log_not_p)
