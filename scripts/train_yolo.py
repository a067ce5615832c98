#!/usr/bin/env python
"""Train the YOLOv8 detector on LineMOD (native Flax training).

Replaces the reference's ultralytics wrapper
(scripts/training/train_yolo.py:27-64): same recipe — 5 epochs, imgsz 640,
batch 16, seed 42 — with the loop owned by pose6d_tpu.models.yolo.train.

Usage:
  python scripts/train_yolo.py --data-root datasets/Linemod_preprocessed/data \
      --save-dir runs/detect/linemod_yolo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--save-dir", default="runs/detect/linemod_yolo")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--lr", type=float, default=None,
                    help="peak learning rate (default: DetTrainConfig's "
                         "1e-3). Resume-fine-tunes restart the stretched "
                         "warmup-cosine near its PEAK — a converged "
                         "checkpoint wants ~1e-4 here, not the from-scratch "
                         "default (a 6.6e-4 resume measurably diverged).")
    ap.add_argument("--scene-roots", default="",
                    help="comma list of multi-object scene trees "
                         "(generate_synthetic_scene layout) mixed into both "
                         "splits — fine-tune for multi-object recall. "
                         "Combine with a save-dir holding an existing "
                         "checkpoint and a larger --epochs to resume-fine-tune "
                         "the single-object detector on scenes.")
    args = ap.parse_args()

    from pose6d_tpu.models.yolo.train import DetTrainConfig, DetectionTrainer

    cfg = DetTrainConfig(
        img_size=args.img_size, batch_size=args.batch_size,
        epochs=args.epochs, seed=args.seed,
        **({"learning_rate": args.lr} if args.lr is not None else {}),
    )
    scene_roots = tuple(s for s in args.scene_roots.split(",") if s)
    trainer = DetectionTrainer(args.data_root, args.save_dir, cfg,
                               scene_roots=scene_roots)
    print(
        f"Training YOLOv8n: {len(trainer.train_loader)} train / "
        f"{len(trainer.val_loader)} val images, {trainer.ycfg.num_classes} classes"
    )
    map50 = trainer.fit()
    print(f"mAP@50: {map50:.4f}")


if __name__ == "__main__":
    main()
