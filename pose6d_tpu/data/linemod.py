"""LineMOD dataset index: directory scan, yaml parse, interleaved split.

Reproduces the reference's sample-index semantics exactly
(data/dataset_rgb.py:32-78, data/dataset_rgbd.py:32-80):
  - object folders are the numeric subdirs of the root
  - per-frame ground truth from gt.yml, intrinsics from info.yml
  - interleaved 80/10/10 split by sorted-image position: i%10==8 -> val,
    i%10==9 -> test, else train
  - annotations filtered to the folder's own object; obj_id is 0-indexed

The scan is done once on the host; everything downstream consumes the plain
list of `Sample` records.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
import yaml


@dataclasses.dataclass
class Sample:
    img_path: str
    depth_path: Optional[str]
    obj_id: int  # 0-indexed
    bbox: np.ndarray  # [4] x, y, w, h (original image frame)
    rot_mat: np.ndarray  # [3, 3] cam_R_m2c
    trans_mm: np.ndarray  # [3] cam_t_m2c in millimeters
    cam_K: np.ndarray  # [3, 3]


def split_of_index(i: int) -> str:
    cycle = i % 10
    if cycle == 8:
        return "val"
    if cycle == 9:
        return "test"
    return "train"


def build_index(
    root_dir: str, mode: str = "train", require_depth: bool = False,
    use_native: bool = True,
) -> List[Sample]:
    """Scan the LineMOD directory layout into a flat sample list.

    With use_native (default), gt.yml/info.yml parse through the C++ parser
    (native/linemod_index.cpp) — the reference's startup hot spot
    (SURVEY §3.1) — falling back to PyYAML transparently."""
    if not os.path.exists(root_dir):
        raise FileNotFoundError(f"Root dir not found: {root_dir}")

    samples: List[Sample] = []
    obj_folders = [f for f in sorted(os.listdir(root_dir)) if f.isdigit()]

    for obj_folder in obj_folders:
        base = os.path.join(root_dir, obj_folder)
        gt_path = os.path.join(base, "gt.yml")
        info_path = os.path.join(base, "info.yml")
        rgb_dir = os.path.join(base, "rgb")
        depth_dir = os.path.join(base, "depth")

        if not (os.path.exists(gt_path) and os.path.exists(info_path)):
            continue
        if require_depth and not os.path.exists(depth_dir):
            continue

        gts = infos = None
        if use_native:
            from . import _native

            gts = _native.parse_gt(gt_path)
            infos = _native.parse_info(info_path)
        if gts is None:
            with open(gt_path, "r") as f:
                gts = yaml.safe_load(f)
        if infos is None:
            with open(info_path, "r") as f:
                infos = yaml.safe_load(f)

        images = sorted(img for img in os.listdir(rgb_dir) if img.endswith(".png"))
        for i, img_name in enumerate(images):
            if split_of_index(i) != mode:
                continue
            frame_id = int(img_name.split(".")[0])
            if frame_id not in gts or frame_id not in infos:
                continue
            for anno in gts[frame_id]:
                if str(int(anno["obj_id"])).zfill(2) != obj_folder:
                    continue
                depth_path = os.path.join(depth_dir, img_name) if os.path.exists(depth_dir) else None
                samples.append(
                    Sample(
                        img_path=os.path.join(rgb_dir, img_name),
                        depth_path=depth_path,
                        obj_id=int(obj_folder) - 1,
                        bbox=np.asarray(anno["obj_bb"], dtype=np.float64),
                        rot_mat=np.asarray(anno["cam_R_m2c"], dtype=np.float64).reshape(3, 3),
                        trans_mm=np.asarray(anno["cam_t_m2c"], dtype=np.float64),
                        cam_K=np.asarray(infos[frame_id]["cam_K"], dtype=np.float32).reshape(3, 3),
                    )
                )
    return samples


@dataclasses.dataclass
class FrameSample:
    """One FRAME with every annotated object — the deployment-time unit
    (a detector sees whole frames, not per-object filtered samples). The
    per-object Sample view above matches the reference's training datasets,
    which filter gt.yml to the folder's own object (data/dataset_rgb.py);
    real LineMOD folder 02 and multi-object synthetic scenes carry several
    annotations per frame, which only this view exposes. Consumed by
    eval_e2e --max-objects."""

    img_path: str
    depth_path: Optional[str]
    cam_K: np.ndarray  # [3, 3]
    objects: List[Sample]  # one per annotation, obj_id 0-indexed


def build_frame_index(
    root_dir: str, mode: str = "train", require_depth: bool = False,
    use_native: bool = True,
) -> List[FrameSample]:
    """Frame-level scan: like build_index, but KEEPS every annotation of a
    frame (no per-folder object filter) and groups them per image."""
    if not os.path.exists(root_dir):
        raise FileNotFoundError(f"Root dir not found: {root_dir}")

    frames: List[FrameSample] = []
    obj_folders = [f for f in sorted(os.listdir(root_dir)) if f.isdigit()]

    for obj_folder in obj_folders:
        base = os.path.join(root_dir, obj_folder)
        gt_path = os.path.join(base, "gt.yml")
        info_path = os.path.join(base, "info.yml")
        rgb_dir = os.path.join(base, "rgb")
        depth_dir = os.path.join(base, "depth")

        if not (os.path.exists(gt_path) and os.path.exists(info_path)):
            continue
        if require_depth and not os.path.exists(depth_dir):
            continue

        gts = infos = None
        if use_native:
            from . import _native

            gts = _native.parse_gt(gt_path)
            infos = _native.parse_info(info_path)
        if gts is None:
            with open(gt_path, "r") as f:
                gts = yaml.safe_load(f)
        if infos is None:
            with open(info_path, "r") as f:
                infos = yaml.safe_load(f)

        images = sorted(img for img in os.listdir(rgb_dir) if img.endswith(".png"))
        for i, img_name in enumerate(images):
            if split_of_index(i) != mode:
                continue
            frame_id = int(img_name.split(".")[0])
            if frame_id not in gts or frame_id not in infos:
                continue
            img_path = os.path.join(rgb_dir, img_name)
            depth_path = (
                os.path.join(depth_dir, img_name)
                if os.path.exists(depth_dir)
                else None
            )
            cam_K = np.asarray(
                infos[frame_id]["cam_K"], dtype=np.float32
            ).reshape(3, 3)
            objs = [
                Sample(
                    img_path=img_path,
                    depth_path=depth_path,
                    obj_id=int(anno["obj_id"]) - 1,
                    bbox=np.asarray(anno["obj_bb"], dtype=np.float64),
                    rot_mat=np.asarray(
                        anno["cam_R_m2c"], dtype=np.float64
                    ).reshape(3, 3),
                    trans_mm=np.asarray(anno["cam_t_m2c"], dtype=np.float64),
                    cam_K=cam_K,
                )
                for anno in gts[frame_id]
            ]
            if objs:
                frames.append(
                    FrameSample(
                        img_path=img_path, depth_path=depth_path,
                        cam_K=cam_K, objects=objs,
                    )
                )
    return frames
