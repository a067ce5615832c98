"""Host-side camera / ground-truth lookup helpers.

Equivalent of the reference's utils/camera.py:15-56: yaml GT + intrinsics
lookup by object folder + frame with DEFAULT_K fallback.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import yaml

from ..geometry.pinhole import DEFAULT_K

__all__ = ["DEFAULT_K", "get_gt_and_K"]


def get_gt_and_K(
    data_dir: str, obj_id_str: str, frame_id: int
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], np.ndarray]:
    """Returns (rotation_matrix, translation_m, camera_matrix); pose entries
    may be None when the frame has no annotation; K falls back to DEFAULT_K."""
    gt_path = os.path.join(data_dir, obj_id_str, "gt.yml")
    info_path = os.path.join(data_dir, obj_id_str, "info.yml")

    r_mat, t, K = None, None, None

    if os.path.exists(info_path):
        with open(info_path, "r") as f:
            infos = yaml.safe_load(f)
        if frame_id in infos:
            K = np.asarray(infos[frame_id]["cam_K"], dtype=np.float64).reshape(3, 3)
        elif infos:
            K = np.asarray(next(iter(infos.values()))["cam_K"], dtype=np.float64).reshape(3, 3)
    if K is None:
        K = DEFAULT_K.copy()

    if os.path.exists(gt_path):
        with open(gt_path, "r") as f:
            gts = yaml.safe_load(f)
        if frame_id in gts:
            for anno in gts[frame_id]:
                if str(int(anno["obj_id"])).zfill(2) == obj_id_str:
                    t = np.asarray(anno["cam_t_m2c"], dtype=np.float64) / 1000.0
                    r_mat = np.asarray(anno["cam_R_m2c"], dtype=np.float64).reshape(3, 3)
                    break

    return r_mat, t, K
