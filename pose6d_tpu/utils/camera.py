"""Host-side camera / ground-truth lookup for single frames.

Keeps the reference's lookup contract (utils/camera.py:15-56 — same return
tuple and fallbacks) but is built from the framework's own pieces: the
per-concern readers below parse gt.yml / info.yml through the native C++
parser (native/linemod_index.cpp) when available, falling back to PyYAML,
instead of re-implementing ad-hoc yaml loads per call site.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..geometry.pinhole import DEFAULT_K

__all__ = ["DEFAULT_K", "load_frame_intrinsics", "load_frame_pose", "get_gt_and_K"]


def _parse(path: str, kind: str):
    """Parse a LineMOD yaml via the native extension, PyYAML as fallback."""
    from ..data import _native

    parsed = (_native.parse_gt if kind == "gt" else _native.parse_info)(path)
    if parsed is not None:
        return parsed
    import yaml

    with open(path, "r") as f:
        return yaml.safe_load(f)


def load_frame_intrinsics(data_dir: str, obj_folder: str, frame_id: int) -> np.ndarray:
    """Camera matrix for one frame from info.yml.

    Fallback chain: frame entry -> any entry of the file -> DEFAULT_K
    (matching the reference's behavior for frames missing from info.yml).
    """
    info_path = os.path.join(data_dir, obj_folder, "info.yml")
    if os.path.exists(info_path):
        infos = _parse(info_path, "info")
        entry = infos.get(frame_id) if infos else None
        if entry is None and infos:
            entry = infos[min(infos)]
        if entry is not None:
            return np.asarray(entry["cam_K"], dtype=np.float64).reshape(3, 3)
    return DEFAULT_K.copy()


def load_frame_pose(
    data_dir: str, obj_folder: str, frame_id: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Ground-truth (rotation_matrix, translation_m) of the folder's own
    object in one frame, or None when unannotated. Translation is converted
    mm -> m; the object is matched by zero-padded folder name."""
    gt_path = os.path.join(data_dir, obj_folder, "gt.yml")
    if not os.path.exists(gt_path):
        return None
    annotations = _parse(gt_path, "gt").get(frame_id, [])
    match = next(
        (a for a in annotations if f"{int(a['obj_id']):02d}" == obj_folder), None
    )
    if match is None:
        return None
    rot = np.asarray(match["cam_R_m2c"], dtype=np.float64).reshape(3, 3)
    trans_m = np.asarray(match["cam_t_m2c"], dtype=np.float64) / 1000.0
    return rot, trans_m


def get_gt_and_K(
    data_dir: str, obj_id_str: str, frame_id: int
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], np.ndarray]:
    """Reference-compatible composite lookup: (rot_mat, trans_m, K); the pose
    entries are None for unannotated frames, K always resolves."""
    pose = load_frame_pose(data_dir, obj_id_str, frame_id)
    K = load_frame_intrinsics(data_dir, obj_id_str, frame_id)
    if pose is None:
        return None, None, K
    return pose[0], pose[1], K
