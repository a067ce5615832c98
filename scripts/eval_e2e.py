#!/usr/bin/env python
"""Full-system evaluation: detector-in-the-loop ADD metrics.

The reference's compare_all_models.py evaluates pose nets on GT-bbox crops;
this script evaluates the COMPLETE deployed system — trained detector ->
device crop -> pose net — against ground truth, reporting detection rate,
class accuracy, and ADD / ADD-S / ADD-0.1d over a split. This is the
deployment-faithful number (the reference has no equivalent).

Usage:
  python scripts/eval_e2e.py --variant rgbd_geometric \
      --data-root .../data --mesh-dir .../models \
      --yolo-weights runs/detect/linemod_yolo --pose-weights weights_rgbd_geometric
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def _eval_multi(args, frames_idx, pipe, evaluator, cls_to_objid):
    """Multi-object frame evaluation (--max-objects > 1): the pipeline emits
    the top-M detections per frame ([B, M] outputs, the reference's
    inference_rgb.py:70 per-box loop vectorized); each GT object greedily
    claims the best-scoring unused detection of its class (detections are
    score-ordered). Unmatched GT objects count as incorrect in the
    full-system ADD-0.1d. Matched pairs evaluate in fixed-size padded chunks
    (obj_id -1 = masked) with exact count-weighted aggregation."""
    import cv2
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    M = args.max_objects
    B = args.batch_size
    need_depth = args.variant.startswith("rgbd")

    total_gt = 0
    matched_q, matched_t, matched_gq, matched_gt_t, matched_ids = [], [], [], [], []
    calibrated = not args.int8_backbone
    for start in range(0, len(frames_idx), B):
        chunk = frames_idx[start : start + B]
        frames, depths = [], []
        for fr in chunk:
            frames.append(cv2.cvtColor(cv2.imread(fr.img_path), cv2.COLOR_BGR2RGB))
            if need_depth and fr.depth_path:
                d = cv2.imread(fr.depth_path, cv2.IMREAD_UNCHANGED)
                depths.append(d.astype(np.float32) / 1000.0)
            else:
                depths.append(np.zeros(frames[-1].shape[:2], np.float32))
        K = np.stack([fr.cam_K for fr in chunk]).astype(np.float32)
        if not calibrated:
            pipe.quantize_backbones(np.stack(frames), K, np.stack(depths),
                                    include_detector=True)
            calibrated = True
        out = pipe(np.stack(frames), K, np.stack(depths))
        det_valid = np.asarray(out["det_valid"])  # [B, M]
        pred_cls = np.asarray(out["class_id"])  # [B, M]
        pred_q_rot = np.asarray(out["rotation"])  # [B, M, 4]
        pred_trans = np.asarray(out["translation"])  # [B, M, 3]
        pred_obj = np.vectorize(lambda c: cls_to_objid.get(int(c), -1))(pred_cls)

        for b, fr in enumerate(chunk):
            total_gt += len(fr.objects)
            used = np.zeros(M, bool)
            for obj in fr.objects:
                hit = next(
                    (d for d in range(M)
                     if det_valid[b, d] and not used[d]
                     and pred_obj[b, d] == obj.obj_id),
                    None,
                )
                if hit is None:
                    continue
                used[hit] = True
                matched_q.append(pred_q_rot[b, hit])
                matched_t.append(pred_trans[b, hit])
                matched_gq.append(R.from_matrix(obj.rot_mat).as_quat())
                matched_gt_t.append(obj.trans_mm / 1000.0)
                matched_ids.append(obj.obj_id)

    n_match = len(matched_ids)
    det_rate = n_match / max(total_gt, 1)
    print(f"split {args.split}: {len(frames_idx)} frames, "
          f"{total_gt} GT objects (max_objects={M})")
    print(f"object detection rate (class-matched): {det_rate * 100:.1f}%")
    if n_match == 0:
        print("ADD-0.1d (full system, unmatched = incorrect): 0.00%")
        return

    # fixed-size padded chunks -> one jitted evaluator shape
    CH = max(B * M, 1)
    pad = (-n_match) % CH
    pq = np.concatenate([matched_q, np.zeros((pad, 4))]).astype(np.float32)
    pt = np.concatenate([matched_t, np.zeros((pad, 3))]).astype(np.float32)
    gq = np.concatenate([matched_gq, np.zeros((pad, 4))]).astype(np.float32)
    gt = np.concatenate([matched_gt_t, np.zeros((pad, 3))]).astype(np.float32)
    ids = np.concatenate([matched_ids, -np.ones(pad)]).astype(np.int32)
    pq[n_match:, 3] = 1.0
    gq[n_match:, 3] = 1.0

    sums = {"add": 0.0, "add_s": 0.0, "acc": 0.0, "count": 0}
    for s in range(0, len(ids), CH):
        m = evaluator.eval_metrics(
            jnp.asarray(pq[s : s + CH]), jnp.asarray(pt[s : s + CH]),
            jnp.asarray(gq[s : s + CH]), jnp.asarray(gt[s : s + CH]),
            jnp.asarray(ids[s : s + CH]),
        )
        c = m["count"]
        sums["add"] += m["add_mean"] * c
        sums["add_s"] += m["add_s_mean"] * c
        sums["acc"] += m["add_01d_acc"] * c
        sums["count"] += c
    n = max(sums["count"], 1)
    acc_matched = sums["acc"] / n
    print(f"ADD (matched): {sums['add'] / n:.1f}mm  "
          f"ADD-S (matched): {sums['add_s'] / n:.1f}mm  "
          f"ADD-0.1d (matched): {acc_matched:.2f}%")
    print(f"ADD-0.1d (full system, unmatched = incorrect): "
          f"{acc_matched * det_rate:.2f}%")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", required=True,
                    choices=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"])
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--yolo-weights", required=True)
    ap.add_argument("--pose-weights", required=True)
    ap.add_argument("--split", default="val", choices=["train", "val", "test"],
                    help="'train' is for held-out SCENE fixtures (multi-object "
                         "frames that trained nothing; it maximizes eval "
                         "frames) — never for a root a model trained on")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--conf-thresh", type=float, default=0.25)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--rot-head-wide", action="store_true",
                    help="evaluate a weights dir trained with the wide-rot-head ablation")
    ap.add_argument("--no-fusion-attention", dest="fusion_attention",
                    action="store_false", default=True,
                    help="evaluate a weights dir trained with the rgbd no-attention ablation")
    ap.add_argument("--z-from-backbone", action="store_true",
                    help="evaluate an rgb_geometric weights dir trained with "
                         "the z-from-ResNet-features diagnosis arm")
    ap.add_argument("--z-backbone-wide", action="store_true",
                    help="evaluate an rgb_geometric weights dir trained with "
                         "the double-width Z-CNN diagnosis arm")
    ap.add_argument("--int8-backbone", action="store_true",
                    help="int8 PTQ serving mode (ops/quant.py): quantize the "
                         "ResNet towers on the first batch (calibration) and "
                         "evaluate the quantized system — the accuracy gate "
                         "for the bench's POSE6D_BENCH_INT8 throughput mode")
    ap.add_argument("--folded-backbone", action="store_true",
                    help="folded bf16 serving mode (pipeline.fold_backbones: "
                         "BN folded into conv weights, bf16 activations, f32 "
                         "MXU accumulation + Pallas fused layer1 at img 224) "
                         "— the accuracy gate for bench.py's folded row")
    ap.add_argument("--folded-pallas", action="store_true",
                    help="with --folded-backbone: run layer1 as the fused "
                         "Pallas kernel (opt-in until probe_pallas_block.py "
                         "clears Mosaic numerics+lowering on chip)")
    ap.add_argument("--folded-stem", action="store_true",
                    help="with --folded-backbone: also run the fused Pallas "
                         "stem kernel (conv1+relu+maxpool, img 224 only); "
                         "gate it only after scripts/probe_pallas_block.py "
                         "validates the kernel's numerics on-chip")
    ap.add_argument("--folded-stages", default="",
                    help="with --folded-backbone: comma list of ResNet "
                         "stages (e.g. '2' or '1,2') to run as parametric "
                         "fused Pallas stage kernels (img 224 only; stage 1 "
                         "here replaces the default fused layer1)")
    ap.add_argument("--yolo-checkpoint", default="best",
                    choices=["best", "last"],
                    help="which detector checkpoint to deploy; 'last' pins "
                         "a resumed fine-tune's final weights even when its "
                         "harder mixed-val mAP never beats the pre-fine-tune "
                         "best (load_yolo_variables prefers 'best')")
    ap.add_argument("--checkpoint", default="best",
                    choices=["best", "last", "best_deploy"],
                    help="which Trainer checkpoint to deploy; 'last' "
                         "quantifies best-by-val-acc selection luck on the "
                         "fixture's noisy val metric (the selection rule "
                         "itself keeps reference parity); 'best_deploy' "
                         "selects by the pinhole-corrected val metric that "
                         "matches this pipeline's geometric correction")
    ap.add_argument("--max-objects", type=int, default=1,
                    help=">1 evaluates MULTI-OBJECT frames (build_frame_index "
                         "keeps every gt.yml annotation): the pipeline "
                         "estimates the top-M detections per frame and each "
                         "GT object greedily claims the best-scoring unused "
                         "detection of its class; unmatched GT objects count "
                         "as incorrect in the full-system ADD-0.1d")
    ap.add_argument("--classes", default=None,
                    help="comma-separated 1-indexed object folder ids in the "
                         "DETECTOR's training class order (e.g. '1,2,3,4,5,6')"
                         "; required when the eval data root's folders differ "
                         "from the detector's training folders (multi-object "
                         "scene fixtures). Default: eval root's folders")
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.data.linemod import build_index
    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.losses.add import ADDEvaluator
    from pose6d_tpu.models.posenet import PoseNetConfig
    from pose6d_tpu.models.yolo.model import YoloConfig
    from pose6d_tpu.models.yolo.train import load_yolo_variables
    from pose6d_tpu.train.checkpoint import load_model_variables

    from pose6d_tpu.data.linemod import build_frame_index

    multi = args.max_objects > 1
    require_depth = args.variant.startswith("rgbd")
    if multi:
        frames_idx = build_frame_index(args.data_root, args.split,
                                       require_depth=require_depth)
        if not frames_idx:
            sys.exit("no frames in split")
        samples = [o for fr in frames_idx for o in fr.objects]
    else:
        samples = build_index(args.data_root, args.split,
                              require_depth=require_depth)
        if not samples:
            sys.exit("no samples in split")
    # detection classes = sorted folder index; pose obj_id = folder - 1.
    if args.classes:
        folders = [f"{int(x):02d}" for x in args.classes.split(",")]
    else:
        folders = sorted({f"{s.obj_id + 1:02d}" for s in samples})
    cls_to_objid = {i: int(f) - 1 for i, f in enumerate(folders)}

    ycfg = YoloConfig(num_classes=len(folders))
    yvars = load_yolo_variables(args.yolo_weights, ycfg,
                                prefer=args.yolo_checkpoint)
    if yvars is None:
        sys.exit(f"no detector checkpoint in {args.yolo_weights}")
    pcfg = get_preset(args.variant, img_size=args.img_size,
                      rot_head_wide=args.rot_head_wide,
                      fusion_attention=args.fusion_attention,
                      z_from_backbone=args.z_from_backbone,
                      z_backbone_wide=args.z_backbone_wide)
    pvars = load_model_variables(args.pose_weights, pcfg,
                                 name=args.checkpoint)
    if pvars is None:
        sys.exit(f"no pose checkpoint in {args.pose_weights}")

    # --folded-backbone gates the DEPLOYED serving config (bf16 pipeline +
    # folded towers), so it runs the bench's compute dtype, not eval f32
    compute_dtype = jnp.bfloat16 if args.folded_backbone else jnp.float32
    pipe = PosePipeline(
        PipelineConfig(variant=args.variant, img_size=args.img_size,
                       conf_thresh=args.conf_thresh,
                       compute_dtype=compute_dtype,
                       max_objects=args.max_objects),
        ycfg, yvars, pvars,
        PoseNetConfig(variant=args.variant, img_size=args.img_size,
                      rot_head_wide=args.rot_head_wide,
                      fusion_attention=args.fusion_attention,
                      z_from_backbone=args.z_from_backbone,
                      z_backbone_wide=args.z_backbone_wide),
    )
    if args.folded_backbone:
        stages = tuple(int(s) for s in args.folded_stages.split(",") if s)
        pipe.fold_backbones(pallas_layer1=(args.folded_pallas
                                           and args.img_size == 224
                                           and 1 not in stages),
                            pallas_stem=(args.folded_stem
                                         and args.img_size == 224),
                            pallas_stages=stages)
    evaluator = ADDEvaluator(args.mesh_dir)

    if multi:
        _eval_multi(args, frames_idx, pipe, evaluator, cls_to_objid)
        return

    B = args.batch_size
    tot = {"add": 0.0, "add_s": 0.0, "acc": 0.0, "n_batches": 0,
           "detected": 0, "cls_correct": 0, "n": 0}
    calibrated = not args.int8_backbone
    for start in range(0, len(samples), B):
        chunk = samples[start : start + B]
        frames, depths, gt_q, gt_t, gt_ids = [], [], [], [], []
        for s in chunk:
            frames.append(cv2.cvtColor(cv2.imread(s.img_path), cv2.COLOR_BGR2RGB))
            if args.variant.startswith("rgbd") and s.depth_path:
                d = cv2.imread(s.depth_path, cv2.IMREAD_UNCHANGED)
                depths.append(d.astype(np.float32) / 1000.0)
            else:
                depths.append(np.zeros(frames[-1].shape[:2], np.float32))
            gt_q.append(R.from_matrix(s.rot_mat).as_quat())
            gt_t.append(s.trans_mm / 1000.0)
            gt_ids.append(s.obj_id)

        K = np.stack([s.cam_K for s in chunk]).astype(np.float32)
        if not calibrated:
            # first batch doubles as the PTQ calibration set (towers + detector)
            pipe.quantize_backbones(np.stack(frames), K, np.stack(depths),
                                    include_detector=True)
            calibrated = True
        out = pipe(np.stack(frames), K, np.stack(depths))
        det_valid = np.asarray(out["det_valid"])
        pred_cls = np.asarray(out["class_id"])
        pred_obj = np.asarray([cls_to_objid.get(int(c), -1) for c in pred_cls])
        gt_ids = np.asarray(gt_ids, np.int32)

        tot["detected"] += int(det_valid.sum())
        tot["cls_correct"] += int(((pred_obj == gt_ids) & det_valid).sum())
        tot["n"] += len(chunk)

        m = evaluator.eval_metrics(
            out["rotation"], out["translation"],
            jnp.asarray(np.asarray(gt_q, np.float32)),
            jnp.asarray(np.asarray(gt_t, np.float32)),
            jnp.asarray(np.where(det_valid, gt_ids, -1)),
        )
        tot["add"] += m["add_mean"]
        tot["add_s"] += m["add_s_mean"]
        tot["acc"] += m["add_01d_acc"]
        tot["n_batches"] += 1

    nb = max(tot["n_batches"], 1)
    det_rate = tot["detected"] / max(tot["n"], 1)
    acc_detected = tot["acc"] / nb
    print(f"split {args.split}: {tot['n']} frames")
    print(f"detection rate: {det_rate * 100:.1f}%  "
          f"class acc (of detected): "
          f"{tot['cls_correct'] / max(tot['detected'], 1) * 100:.1f}%")
    # ADD/ADD-S means are over detected frames only (undetected frames have no
    # pose); the full-system ADD-0.1d counts an undetected frame as incorrect.
    print(f"ADD (detected): {tot['add'] / nb:.1f}mm  "
          f"ADD-S (detected): {tot['add_s'] / nb:.1f}mm  "
          f"ADD-0.1d (detected): {acc_detected:.2f}%")
    print(f"ADD-0.1d (full system, undetected = incorrect): "
          f"{acc_detected * det_rate:.2f}%")


if __name__ == "__main__":
    main()
