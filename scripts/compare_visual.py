#!/usr/bin/env python
"""Visual side-by-side comparison: GT vs all trained variants on random
val frames (saved PNG grid per sample).

Port of the reference's scripts/visualization/compare_visual.py:215-293:
GT-bbox crops (no detector), every model's predicted box rendered next to
the ground truth; X/Y re-derived from predicted Z + original bbox center +
original K for every model (compare_visual.py:201-206).

Usage:
  python scripts/compare_visual.py --data-root .../data --mesh-dir .../models \
      --weights-root . --num-samples 3 --out-dir results
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

VARIANTS = ["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--weights-root", default=".")
    ap.add_argument("--num-samples", type=int, default=3)
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--img-size", type=int, default=224,
                    help="pose crop size (checkpoints are size-independent)")
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.data.pipeline import LineMODPoseLoader
    from pose6d_tpu.geometry.pinhole import pinhole_xy_from_z
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.ops.augment import eval_preprocess
    from pose6d_tpu.train.checkpoint import load_model_variables
    from pose6d_tpu.utils import draw_3d_box, load_mesh_corners, project_points

    os.makedirs(args.out_dir, exist_ok=True)
    loader = LineMODPoseLoader(
        args.data_root, mode="val", flavor="rgbd", img_size=args.img_size,
        augment_bbox=False, num_workers=0
    )
    if len(loader) == 0:
        sys.exit("no val samples found")

    models = {}
    for variant in VARIANTS:
        variables = load_model_variables(
            os.path.join(args.weights_root, f"weights_{variant}"),
            get_preset(variant, img_size=args.img_size),
        )
        if variables is not None:
            models[variant] = (
                PoseNet(PoseNetConfig(variant=variant, img_size=args.img_size)),
                variables,
            )
    if not models:
        sys.exit("no trained models found")

    rng = np.random.default_rng(args.seed)
    idxs = rng.choice(len(loader), min(args.num_samples, len(loader)), replace=False)

    for si, idx in enumerate(idxs):
        s = loader.load_sample(int(idx), rng)
        raw = loader.samples[int(idx)]
        bgr_full = cv2.imread(raw.img_path)
        folder = f"{raw.obj_id + 1:02d}"
        corners = load_mesh_corners(args.mesh_dir, folder)
        K = raw.cam_K

        panels = []
        gt_panel = bgr_full.copy()
        if corners is not None:
            draw_3d_box(gt_panel, project_points(corners, s["quat"], s["trans"], K), (0, 255, 0))
        cv2.putText(gt_panel, "GT", (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 255, 0), 2)
        panels.append(gt_panel)

        rgb_in = eval_preprocess(jnp.asarray(s["rgb"])[None])
        for variant, (model, variables) in models.items():
            kwargs = {}
            if variant == "rgb_geometric":
                kwargs = {"bbox_center": jnp.asarray(s["center_orig"])[None],
                          "camera_matrix": jnp.asarray(s["cam_K"])[None]}
            elif variant == "rgbd":
                kwargs = {"depth": jnp.asarray(s["depth"])[None]}
            elif variant == "rgbd_geometric":
                kwargs = {"depth_raw": jnp.asarray(s["depth_raw"])[None],
                          "bbox_center": jnp.asarray(s["center_crop"])[None],
                          "camera_matrix": jnp.asarray(s["cam_K_crop"])[None]}
            quat, trans = model.apply(variables, rgb_in, **kwargs)
            quat = np.asarray(quat)[0]
            trans = np.asarray(trans)[0]
            # reference recomputes X/Y from Z for every model (:201-206)
            trans = np.asarray(
                pinhole_xy_from_z(
                    jnp.asarray([trans[2]]), jnp.asarray(s["center_orig"])[None],
                    jnp.asarray(K),
                )
            )[0]
            panel = bgr_full.copy()
            if corners is not None:
                draw_3d_box(panel, project_points(corners, s["quat"], s["trans"], K), (0, 255, 0))
                draw_3d_box(panel, project_points(corners, quat, trans, K), (0, 0, 255))
            cv2.putText(panel, variant, (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 0, 255), 2)
            panels.append(panel)

        grid = np.concatenate(panels, axis=1)
        out_path = os.path.join(args.out_dir, f"comparison_{si}_obj{folder}.png")
        cv2.imwrite(out_path, grid)
        print(f"saved {out_path}")


if __name__ == "__main__":
    main()
