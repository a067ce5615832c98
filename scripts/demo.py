#!/usr/bin/env python
"""Scripted end-to-end demo: the framework's answer to the reference's Colab
notebook (colab_notebook.ipynb cells 2-19).

Runs the full system on the hermetic synthetic dataset (no downloads):
  1. generate synthetic LineMOD tree
  2. prepare_yolo export
  3. train the detector (short)
  4. train one pose variant (short)
  5. comparison table on val
  6. single-image inference with overlay

Use --full on real LineMOD data for the reference recipes.

Usage:
  python scripts/demo.py --workdir /tmp/pose6d_demo [--epochs 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="demo_workdir")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--variant", default="rgbd_geometric")
    ap.add_argument("--img-size", type=int, default=64,
                    help="pose crop size (small default for CPU demos)")
    ap.add_argument("--det-size", type=int, default=320)
    ap.add_argument("--frames", type=int, default=30,
                    help="synthetic frames per object")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.data.detection import prepare_yolo_dataset
    from pose6d_tpu.data.synthetic import generate_synthetic_linemod
    from pose6d_tpu.models.yolo.train import DetTrainConfig, DetectionTrainer
    from pose6d_tpu.ops.augment import AugmentConfig
    from pose6d_tpu.train import Trainer

    print("== 1. synthetic dataset")
    paths = generate_synthetic_linemod(
        os.path.join(args.workdir, "Linemod_synthetic"),
        obj_ids=(1, 2), frames_per_obj=args.frames,
    )
    print(paths)

    print("== 2. prepare_yolo export")
    stats = prepare_yolo_dataset(paths["data"], os.path.join(args.workdir, "yolo_ready"))
    print(stats)

    print("== 3. detector training")
    det_cfg = DetTrainConfig(img_size=args.det_size, batch_size=8, epochs=args.epochs)
    det = DetectionTrainer(paths["data"], os.path.join(args.workdir, "yolo_ckpt"), det_cfg)
    map50 = det.fit()

    print("== 4. pose training")
    cfg = get_preset(
        args.variant, img_size=args.img_size, batch_size=8, epochs=args.epochs,
        augment=AugmentConfig(grayscale_p=0.0),
    )
    pose_dir = os.path.join(args.workdir, f"weights_{args.variant}")
    trainer = Trainer(cfg, paths["data"], paths["models"], pose_dir, num_workers=0)
    best = trainer.fit()

    print("== 5. evaluation")
    rng = np.random.default_rng(0)
    metrics = trainer.validate(rng)
    print({k: round(v, 3) for k, v in metrics.items()})

    print("== 6. inference overlay")
    import cv2
    import jax.numpy as jnp

    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.utils import DEFAULT_K, draw_3d_box, load_mesh_corners, project_points

    sample = trainer.val_loader.samples[0]
    frame = cv2.cvtColor(cv2.imread(sample.img_path), cv2.COLOR_BGR2RGB)
    depth = None
    if sample.depth_path:
        depth = cv2.imread(sample.depth_path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 1e3

    pipe = PosePipeline(
        PipelineConfig(variant=args.variant, img_size=args.img_size,
                       det_size=args.det_size, conf_thresh=0.0,
                       compute_dtype=jnp.float32),
        det.ycfg,
        {"params": det.params, "batch_stats": det.batch_stats},
        {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
    )
    out = pipe(frame[None], DEFAULT_K, depth[None] if depth is not None else None)
    quat = np.asarray(out["rotation"])[0]
    trans = np.asarray(out["translation"])[0]
    print("pred quat:", np.round(quat, 3), "trans:", np.round(trans, 3))

    canvas = frame[:, :, ::-1].copy()
    corners = load_mesh_corners(paths["models"], f"{sample.obj_id + 1:02d}")
    if corners is not None:
        draw_3d_box(canvas, project_points(corners, quat, trans, DEFAULT_K))
    out_path = os.path.join(args.workdir, "demo_result.png")
    cv2.imwrite(out_path, canvas)
    print(f"saved {out_path}")
    print(f"\ndemo complete: mAP@50 {map50:.3f}, best ADD-0.1d {best:.2f}%")


if __name__ == "__main__":
    main()
