#!/usr/bin/env python
"""Run the full detect -> crop -> pose pipeline on an image and render the
3D box + axes overlay.

Replaces the reference's four inference scripts
(scripts/inference/inference_{rgb,rgb_geometric,rgbd,rgbd_geometric}.py)
with one CLI over the unified jitted pipeline. Depth for the rgbd variants
is located by the reference's filename convention ("{obj}_{frame}.png" ->
data/{obj}/depth/{frame}.png, inference_rgbd_geometric.py:65-91) or passed
explicitly.

Usage:
  python scripts/infer.py --variant rgbd_geometric --image path/to/01_0000.png \
      --yolo-weights runs/detect/linemod_yolo --pose-weights weights_rgbd_geometric \
      --mesh-dir .../models --output out.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

# class id (sorted-folder index) -> LineMOD folder, matching the reference's
# hardcoded map (inference_rgb.py:28-31); LineMOD has no folders 03/07
LINEMOD_FOLDERS = ["01", "02", "04", "05", "06", "08", "09", "10", "11", "12", "13", "14", "15"]


def locate_depth(image_path: str, data_root: str | None):
    """Reference filename convention: {obj}_{frame}.png."""
    name = os.path.basename(image_path)
    if "_" not in name or data_root is None:
        return None
    obj, frame = name.split("_", 1)
    cand = os.path.join(data_root, obj, "depth", frame)
    return cand if os.path.exists(cand) else None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", required=True,
                    choices=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"])
    ap.add_argument("--image", required=True)
    ap.add_argument("--depth", default=None)
    ap.add_argument("--yolo-weights", required=True)
    ap.add_argument("--pose-weights", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--data-root", default=None, help="for depth lookup + GT/K")
    ap.add_argument("--output", default="inference_result.png")
    ap.add_argument("--num-classes", type=int, default=13)
    ap.add_argument("--img-size", type=int, default=224,
                    help="pose crop size (checkpoints are size-independent)")
    ap.add_argument("--f32", action="store_true",
                    help="compute in float32 (CPU runs; default bfloat16)")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.models.yolo.model import YoloConfig
    from pose6d_tpu.models.yolo.train import load_yolo_variables
    from pose6d_tpu.train.checkpoint import load_model_variables
    from pose6d_tpu.utils import DEFAULT_K, draw_3d_box, draw_axes, load_mesh_corners, project_points

    # ---- load models (detector uses EMA weights)
    ycfg = YoloConfig(num_classes=args.num_classes)
    yvars = load_yolo_variables(args.yolo_weights, ycfg)
    if yvars is None:
        sys.exit(f"no detector checkpoint in {args.yolo_weights}")

    pose_vars = load_model_variables(
        args.pose_weights, get_preset(args.variant, img_size=args.img_size)
    )
    if pose_vars is None:
        sys.exit(f"no pose checkpoint in {args.pose_weights}")

    pipe = PosePipeline(
        PipelineConfig(
            variant=args.variant, img_size=args.img_size,
            compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        ),
        ycfg, yvars, pose_vars,
    )

    # ---- load inputs
    bgr = cv2.imread(args.image)
    if bgr is None:
        sys.exit(f"cannot read {args.image}")
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)

    depth_m = None
    if args.variant.startswith("rgbd"):
        dpath = args.depth or locate_depth(args.image, args.data_root)
        if dpath:
            depth_m = cv2.imread(dpath, cv2.IMREAD_UNCHANGED).astype(np.float32) / 1000.0
        else:
            print("warning: no depth found, using zeros")
            depth_m = np.zeros(rgb.shape[:2], np.float32)

    out = pipe(
        rgb[None], DEFAULT_K,
        depth_m[None] if depth_m is not None else None,
    )
    quat = np.asarray(out["rotation"])[0]
    trans = np.asarray(out["translation"])[0]
    cls_id = int(np.asarray(out["class_id"])[0])
    score = float(np.asarray(out["det_score"])[0])
    folder = LINEMOD_FOLDERS[cls_id] if 0 <= cls_id < len(LINEMOD_FOLDERS) else "??"
    print(f"detected class {cls_id} (obj {folder}) score {score:.3f}")
    print(f"quat(xyzw): {quat}")
    print(f"trans (m): {trans}")

    corners = load_mesh_corners(args.mesh_dir, folder)
    canvas = bgr.copy()
    if corners is not None:
        pts = project_points(corners, quat, trans, DEFAULT_K)
        draw_3d_box(canvas, pts, color=(0, 255, 0))
    draw_axes(canvas, quat, trans, DEFAULT_K)
    bb = np.asarray(out["bbox_xywh"])[0].astype(int)
    cv2.rectangle(canvas, (bb[0], bb[1]), (bb[0] + bb[2], bb[1] + bb[3]), (255, 0, 0), 2)
    cv2.imwrite(args.output, canvas)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
