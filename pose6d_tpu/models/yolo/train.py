"""Native YOLOv8 training: jitted detection step, device augmentation, mAP.

Owns the loop the reference delegates to ultralytics model.train(...)
(scripts/training/train_yolo.py:44-57): recipe parity is 5 epochs, imgsz
640, batch 16, seed 42, resume-from-last. Optimizer mirrors ultralytics'
'auto' choice for small runs (AdamW, lr 1e-3 with 3-epoch linear warmup,
weight decay 5e-4). Augmentation (horizontal flip + HSV jitter) runs on
device inside the jitted step; EMA weights (ramped decay, ModelEMA parity)
are maintained per step and used for eval/export.

Mosaic note: ultralytics' default close_mosaic=10 disables mosaic for the
final 10 epochs — with the reference's 5-epoch run, mosaic is therefore OFF
for the entire training, so this trainer intentionally has none.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...ops.augment import _hsv_to_rgb, _rgb_to_hsv, to_float01
from .decode import batched_nms, decode_outputs, dfl_expectation, make_anchors
from .loss import detection_loss
from .model import YoloConfig, YoloV8


@dataclasses.dataclass(frozen=True)
class DetTrainConfig:
    img_size: int = 640
    batch_size: int = 16
    epochs: int = 5
    learning_rate: float = 1e-3
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    flip_p: float = 0.5
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    # ultralytics random_perspective defaults (degrees/shear/perspective = 0):
    # scale ~ U(1-0.5, 1+0.5), center translated by +-10% of the image size.
    affine_scale: float = 0.5
    affine_translate: float = 0.1
    seed: int = 42


def hsv_augment(key: jax.Array, img: jax.Array, cfg: DetTrainConfig) -> jax.Array:
    """Per-image random HSV gains (ultralytics augment_hsv analogue)."""
    kh, ks, kv = jax.random.split(key, 3)
    gh = jax.random.uniform(kh, (), minval=-cfg.hsv_h, maxval=cfg.hsv_h)
    gs = 1.0 + jax.random.uniform(ks, (), minval=-cfg.hsv_s, maxval=cfg.hsv_s)
    gv = 1.0 + jax.random.uniform(kv, (), minval=-cfg.hsv_v, maxval=cfg.hsv_v)
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] + gh) % 1.0
    s = jnp.clip(hsv[..., 1] * gs, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * gv, 0.0, 1.0)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def flip_augment(key: jax.Array, img: jax.Array, boxes: jax.Array, p: float, W: int):
    """Horizontal flip of one image + its xyxy boxes."""
    take = jax.random.uniform(key, ()) < p
    flipped = img[:, ::-1]
    fb = jnp.stack(
        [W - boxes[:, 2], boxes[:, 1], W - boxes[:, 0], boxes[:, 3]], axis=-1
    )
    return jnp.where(take, flipped, img), jnp.where(take, fb, boxes)


def affine_augment(
    key: jax.Array,
    img: jax.Array,  # [H, W, 3] float in [0, 1]
    boxes: jax.Array,  # [M, 4] xyxy pixels
    mask: jax.Array,  # [M] bool
    cfg: DetTrainConfig,
    fill: float = 114.0 / 255.0,
):
    """Random scale + translate of one image and its boxes, on device.

    Ultralytics random_perspective with degrees=shear=perspective=0 reduces to
    out(x) = in((x - t) / s) with s ~ U(1-scale, 1+scale) and the image center
    moved to U(0.5-translate, 0.5+translate) of the frame; out-of-frame pixels
    take the gray border value (114). Surviving boxes follow the ultralytics
    box_candidates filter (w,h > 2px, area ratio > 0.1, aspect < 100).
    """
    H, W = img.shape[0], img.shape[1]
    ks, ktx, kty = jax.random.split(key, 3)
    s = jax.random.uniform(ks, (), minval=1.0 - cfg.affine_scale, maxval=1.0 + cfg.affine_scale)
    cx = jax.random.uniform(
        ktx, (), minval=0.5 - cfg.affine_translate, maxval=0.5 + cfg.affine_translate
    )
    cy = jax.random.uniform(
        kty, (), minval=0.5 - cfg.affine_translate, maxval=0.5 + cfg.affine_translate
    )
    # scale_and_translate semantics: out(x) = in((x - t) / s); place the scaled
    # image center at (cx*W, cy*H).
    tx = cx * W - s * (W / 2.0)
    ty = cy * H - s * (H / 2.0)
    scaled = jax.image.scale_and_translate(
        img, img.shape, (0, 1),
        jnp.stack([s, s]), jnp.stack([ty, tx]), method="linear",
    )
    coverage = jax.image.scale_and_translate(
        jnp.ones((H, W, 1), img.dtype), (H, W, 1), (0, 1),
        jnp.stack([s, s]), jnp.stack([ty, tx]), method="linear",
    )
    out = scaled + (1.0 - coverage) * fill

    x1 = boxes[:, 0] * s + tx
    y1 = boxes[:, 1] * s + ty
    x2 = boxes[:, 2] * s + tx
    y2 = boxes[:, 3] * s + ty
    nx1 = jnp.clip(x1, 0.0, W)
    ny1 = jnp.clip(y1, 0.0, H)
    nx2 = jnp.clip(x2, 0.0, W)
    ny2 = jnp.clip(y2, 0.0, H)
    new_boxes = jnp.stack([nx1, ny1, nx2, ny2], axis=-1)

    w0 = (boxes[:, 2] - boxes[:, 0]) * s
    h0 = (boxes[:, 3] - boxes[:, 1]) * s
    w1 = nx2 - nx1
    h1 = ny2 - ny1
    eps = 1e-6
    ar = jnp.maximum(w1 / (h1 + eps), h1 / (w1 + eps))
    keep = (
        (w1 > 2.0) & (h1 > 2.0)
        & (w1 * h1 / (w0 * h0 + eps) > 0.1)
        & (ar < 100.0)
    )
    return out, new_boxes, mask & keep


def ema_update(ema_params, params, step: jax.Array, decay: float = 0.9999):
    """Ramped EMA (ultralytics ModelEMA): d = decay * (1 - exp(-step/2000))."""
    d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / 2000.0))
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema_params, params)


def make_det_train_step(model: YoloV8, tx, cfg: DetTrainConfig, ycfg: YoloConfig):
    anchors, strides = make_anchors((cfg.img_size, cfg.img_size), ycfg.strides)

    def step(params, batch_stats, opt_state, batch, key):
        k_hsv, k_flip, k_aff = jax.random.split(key, 3)
        B = batch["image"].shape[0]
        imgs = jax.vmap(lambda k, im: hsv_augment(k, im, cfg))(
            jax.random.split(k_hsv, B), to_float01(batch["image"])
        )
        imgs, boxes = jax.vmap(
            lambda k, im, bx: flip_augment(k, im, bx, cfg.flip_p, cfg.img_size)
        )(jax.random.split(k_flip, B), imgs, batch["gt_boxes"])
        gt_mask = batch["gt_mask"]
        if cfg.affine_scale > 0.0 or cfg.affine_translate > 0.0:
            imgs, boxes, gt_mask = jax.vmap(
                lambda k, im, bx, m: affine_augment(k, im, bx, m, cfg)
            )(jax.random.split(k_aff, B), imgs, boxes, gt_mask)

        def loss_fn(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            box_l = jnp.concatenate(
                [o[0].reshape(B, -1, 4 * ycfg.reg_max) for o in outputs], axis=1
            )
            cls_l = jnp.concatenate(
                [o[1].reshape(B, -1, ycfg.num_classes) for o in outputs], axis=1
            )
            ltrb = dfl_expectation(box_l, ycfg.reg_max)
            x1y1 = (anchors[None] - ltrb[..., :2]) * strides[None, :, None]
            x2y2 = (anchors[None] + ltrb[..., 2:]) * strides[None, :, None]
            pred_boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
            losses = detection_loss(
                box_l, cls_l, pred_boxes, anchors, strides,
                boxes, batch["gt_labels"], gt_mask, ycfg.reg_max,
            )
            return losses["total"], (losses, updates)

        (total, (losses, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # Skip nonfinite steps (ultralytics' AMP GradScaler analogue).
        # Without this, ONE inf/nan gradient is fatal: clip_by_global_norm's
        # scale becomes 0 * inf = NaN and every parameter is nuked in a
        # single step (observed on a resumed scene fine-tune, round 4).
        # Zeroing grads — rather than wrapping tx in optax.apply_if_finite /
        # zero_nans — keeps the opt_state TREE unchanged, so existing
        # checkpoints stay restorable; zeroing the update keeps params and
        # running batch_stats bitwise-untouched on the skipped step.
        finite = jnp.isfinite(total)
        for g in jax.tree.leaves(grads):
            finite &= jnp.all(jnp.isfinite(g))
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        update, opt_state = tx.update(grads, opt_state, params)
        update = jax.tree.map(lambda u: jnp.where(finite, u, 0.0), update)
        params = optax.apply_updates(params, update)
        new_bs = updates.get("batch_stats", batch_stats)
        new_bs = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_bs, batch_stats
        )
        return params, new_bs, opt_state, losses

    return jax.jit(step, donate_argnums=(0, 1, 2))


def load_yolo_variables(save_dir: str, ycfg: YoloConfig, img_size: int = 640,
                        prefer: str = "best") -> Optional[dict]:
    """Restore detector inference variables from a DetectionTrainer checkpoint.

    Returns {'params', 'batch_stats'} with the EMA weights as params (they
    are what eval/export should use), or None if no checkpoint exists.
    Restores without an abstract tree so it reads any checkpoint format
    (full-trainer-state or the older params/ema-only layout).
    """
    import orbax.checkpoint as ocp

    for name in (prefer, "last" if prefer != "last" else "best"):
        path = os.path.join(os.path.abspath(save_dir), name)
        if not os.path.isdir(path):
            continue
        try:
            restored = ocp.StandardCheckpointer().restore(path)
        except Exception as e:
            print(f"[yolo] restore of {path} failed: {e}")
            continue
        to_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
        return {
            "params": to_jnp(restored["ema_params"]),
            "batch_stats": to_jnp(restored.get("batch_stats") or {}),
        }
    return None


# ------------------------------------------------------------------------ mAP


def average_precision(tp: np.ndarray, conf: np.ndarray, n_gt: int) -> float:
    """All-point-interpolation AP from per-prediction TP flags + scores."""
    if n_gt == 0 or len(tp) == 0:
        return 0.0
    order = np.argsort(-conf)
    tp = tp[order]
    fp = ~tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    # envelope + integrate
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[1.0], precision, [0.0]])
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _iou_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized IoU between xyxy box sets [N,4] x [M,4] -> [N,M] (numpy —
    the matching below is host logic; no per-prediction device round-trips)."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0.0, None), axis=1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0.0, None), axis=1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def evaluate_map50(
    predictions: List[dict], ground_truths: List[dict], num_classes: int,
    iou_thresh: float = 0.5,
) -> float:
    """mAP@50 over a list of per-image predictions/gts.

    predictions[i]: {'boxes' [D,4], 'scores' [D], 'classes' [D], 'valid' [D]}
    ground_truths[i]: {'boxes' [M,4], 'labels' [M], 'mask' [M]}

    All-numpy: one vectorized IoU matrix per (image, class), greedy matching
    on the host — no device calls in the loop (the reference-scale val split
    is ~1.5k images x max_det predictions).
    """
    aps = []
    for c in range(num_classes):
        tps, confs = [], []
        n_gt = 0
        for pred, gt in zip(predictions, ground_truths):
            gt_sel = (gt["labels"] == c) & gt["mask"]
            gt_boxes = np.asarray(gt["boxes"])[gt_sel]
            n_gt += len(gt_boxes)
            p_sel = (pred["classes"] == c) & pred["valid"]
            p_boxes = np.asarray(pred["boxes"])[p_sel]
            p_scores = np.asarray(pred["scores"])[p_sel]
            if len(p_boxes) == 0:
                continue
            order = np.argsort(-p_scores)
            if len(gt_boxes) == 0:
                tps.extend([False] * len(order))
                confs.extend(p_scores[order].tolist())
                continue
            ious = _iou_matrix_np(p_boxes[order], gt_boxes)  # [D, M]
            matched = np.zeros(len(gt_boxes), bool)
            for row, score in zip(ious, p_scores[order]):
                j = int(np.argmax(row))
                if row[j] >= iou_thresh and not matched[j]:
                    matched[j] = True
                    tps.append(True)
                else:
                    tps.append(False)
                confs.append(float(score))
        if n_gt == 0:
            continue
        aps.append(average_precision(np.asarray(tps), np.asarray(confs), n_gt))
    return float(np.mean(aps)) if aps else 0.0


# -------------------------------------------------------------------- trainer


class DetectionTrainer:
    """5-epoch YOLOv8 finetune on LineMOD (train_yolo.py recipe, native)."""

    def __init__(
        self,
        source_root: str,
        save_dir: str,
        cfg: DetTrainConfig = DetTrainConfig(),
        ycfg: Optional[YoloConfig] = None,
        num_workers: int = 0,
        scene_roots: Tuple[str, ...] = (),
    ):
        from ...data.detection import DetectionLoader

        self.cfg = cfg
        # scene_roots: multi-object scene trees (data/detection.py
        # _scan_scene_samples) mixed into BOTH splits — the fine-tune path
        # for multi-object recall (eval_e2e --max-objects measures it e2e)
        self.train_loader = DetectionLoader(
            source_root, "train", cfg.img_size, scene_roots=scene_roots)
        self.val_loader = DetectionLoader(
            source_root, "val", cfg.img_size, scene_roots=scene_roots)
        self.ycfg = ycfg or YoloConfig(num_classes=self.train_loader.num_classes)
        self.model = YoloV8(self.ycfg)

        steps_per_epoch = max(len(self.train_loader) // cfg.batch_size, 1)
        total = max(cfg.epochs * steps_per_epoch, 2)
        # short runs: warmup must leave room for the decay phase
        warmup = min(max(int(cfg.warmup_epochs * steps_per_epoch), 1), total - 1)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, total, cfg.learning_rate * 0.01
        )
        self._sched = sched
        self.tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adamw(sched, weight_decay=cfg.weight_decay),
        )

        variables = self.model.init(
            jax.random.key(cfg.seed), jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        # EMA of params (ultralytics ModelEMA parity); eval/export use EMA.
        # Real copies, not aliases — the train step donates self.params.
        self.ema_params = jax.tree.map(jnp.copy, self.params)
        self.global_step = jnp.zeros((), jnp.int32)
        self.completed_epochs = 0
        self.best_map = -1.0
        self._ema_fn = jax.jit(ema_update, donate_argnums=0)
        self.step_fn = make_det_train_step(self.model, self.tx, cfg, self.ycfg)
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)

        self._infer = jax.jit(
            lambda p, bs, im: self._infer_impl(p, bs, im)
        )

    # ------------------------------------------------------------- checkpoint
    #
    # Full trainer state, matching ultralytics' resume-from-last semantics
    # (reference scripts/training/train_yolo.py:35-39): optimizer moments,
    # global step (drives the warmup-cosine schedule and the EMA ramp),
    # completed-epoch count, and best mAP for best-gating.

    def _ckpt_tree(self) -> dict:
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "ema_params": self.ema_params,
            "opt_state": self.opt_state,
            "meta": {
                "global_step": self.global_step,
                "epoch": jnp.asarray(self.completed_epochs, jnp.int32),
                "best_map": jnp.asarray(self.best_map, jnp.float32),
            },
        }

    def save_checkpoint(self, name: str = "last") -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(self.save_dir, name), self._ckpt_tree(), force=True)
        ckptr.wait_until_finished()

    def try_resume(self, name: str = "last") -> bool:
        path = os.path.join(self.save_dir, name)
        if not os.path.isdir(path):
            return False
        import orbax.checkpoint as ocp

        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, self._ckpt_tree())
        try:
            restored = ocp.StandardCheckpointer().restore(path, abstract)
        except Exception as e:
            print(f"[yolo] checkpoint restore failed ({e}); starting fresh")
            return False
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]
        self.ema_params = restored["ema_params"]
        self.opt_state = restored["opt_state"]
        self.global_step = restored["meta"]["global_step"]
        self.completed_epochs = int(restored["meta"]["epoch"])
        self.best_map = float(restored["meta"]["best_map"])
        return True

    def _infer_impl(self, params, batch_stats, images):
        images = to_float01(images)
        outputs = self.model.apply({"params": params, "batch_stats": batch_stats}, images)
        boxes, scores = decode_outputs(outputs, self.ycfg, images.shape[1:3])
        return batched_nms(boxes, scores, max_det=10, pre_topk=100)

    def train_epoch(self, epoch: int, rng: np.random.Generator) -> float:
        losses_dev = []
        key = jax.random.key(self.cfg.seed * 7919 + epoch)
        for batch in self.train_loader.batches(self.cfg.batch_size, rng, shuffle=True):
            key, sub = jax.random.split(key)
            self.params, self.batch_stats, self.opt_state, losses = self.step_fn(
                self.params, self.batch_stats, self.opt_state, batch, sub
            )
            self.global_step = self.global_step + 1
            self.ema_params = self._ema_fn(self.ema_params, self.params, self.global_step)
            losses_dev.append(losses["total"])
        # ONE host fetch per epoch (per-step .item() pays a full tunnel RTT
        # and also forces execution of the whole lazy dispatch chain)
        if not losses_dev:
            return 0.0
        arr = np.asarray(jnp.stack(losses_dev))
        n_bad = int(np.count_nonzero(~np.isfinite(arr)))
        if n_bad:
            # those steps were skipped by the train-step guard; the mean over
            # the finite steps is the honest epoch loss
            print(f"[yolo] epoch {epoch + 1}: skipped {n_bad}/{arr.size} "
                  f"nonfinite step(s)")
            if n_bad == arr.size:
                return float("nan")
        return float(np.nanmean(arr))

    def validate_map50(self, rng: np.random.Generator) -> float:
        # accumulate detections ON DEVICE across the whole split, then fetch
        # once — the same one-host-sync-per-epoch discipline as train_epoch
        # (a per-batch np.asarray pays a full tunnel RTT per batch)
        dev_outs, host_gts = [], []
        for batch in self.val_loader.batches(
            self.cfg.batch_size, rng, shuffle=False, drop_remainder=False
        ):
            dev_outs.append(
                self._infer(self.ema_params, self.batch_stats, jnp.asarray(batch["image"]))
            )
            host_gts.append(batch)
        if not dev_outs:
            return 0.0
        out = jax.device_get(
            {k: jnp.concatenate([o[k] for o in dev_outs], axis=0) for k in dev_outs[0]}
        )
        preds, gts = [], []
        row = 0
        for batch in host_gts:
            for i in range(len(batch["valid"])):
                if batch["valid"][i]:
                    preds.append({k: out[k][row + i] for k in out})
                    gts.append(
                        {
                            "boxes": batch["gt_boxes"][i],
                            "labels": batch["gt_labels"][i],
                            "mask": batch["gt_mask"][i],
                        }
                    )
            row += len(batch["valid"])
        return evaluate_map50(preds, gts, self.ycfg.num_classes)

    def fit(self, epochs: Optional[int] = None, validate_every: int = 1) -> float:
        """Train with per-epoch validation, best-mAP gating, and true resume:
        restarting after an interruption continues the LR schedule, EMA ramp,
        and optimizer moments from the saved step, skipping completed epochs
        (ultralytics resume parity). `validate_every` > 1 skips intermediate
        mAP evals (the final epoch always validates)."""
        epochs = epochs or self.cfg.epochs
        rng = np.random.default_rng(self.cfg.seed)
        if self.try_resume():
            print(
                f"[yolo] resumed from last checkpoint: epoch {self.completed_epochs}, "
                f"step {int(self.global_step)}, best mAP {self.best_map:.4f}"
            )
        map50 = self.best_map
        metrics_path = os.path.join(self.save_dir, "metrics.csv")
        # header if absent OR zero-length: a kill before the first flush can
        # leave an empty file, and appending data rows to it loses the header
        write_header = (not os.path.exists(metrics_path)
                        or os.path.getsize(metrics_path) == 0)
        for epoch in range(self.completed_epochs, epochs):
            t0 = time.monotonic()
            loss = self.train_epoch(epoch, rng)
            self.completed_epochs = epoch + 1
            validated = (epoch + 1) % validate_every == 0 or epoch + 1 == epochs
            if validated:
                map50 = self.validate_map50(rng)
                if map50 > self.best_map:
                    self.best_map = map50
                    self.save_checkpoint("best")
                print(
                    f"[yolo] epoch {epoch + 1}/{epochs} loss {loss:.4f} "
                    f"mAP@50 {map50:.4f} (best {self.best_map:.4f}, "
                    f"{time.monotonic() - t0:.1f}s)"
                )
            else:
                print(
                    f"[yolo] epoch {epoch + 1}/{epochs} loss {loss:.4f} "
                    f"({time.monotonic() - t0:.1f}s)"
                )
            self.save_checkpoint("last")
            # per-epoch training curve (ultralytics results.csv analogue)
            with open(metrics_path, "a", newline="") as f:
                if write_header:
                    f.write("epoch,train_loss,map50,best_map50,lr,epoch_seconds\n")
                    write_header = False
                lr = float(self._sched(int(self.global_step)))
                f.write(
                    f"{epoch + 1},{loss:.6f},"
                    f"{map50 if validated else ''},{self.best_map:.6f},"
                    f"{lr:.8f},{time.monotonic() - t0:.2f}\n"
                )
        print(f"mAP@50: {map50:.4f}")
        return map50
