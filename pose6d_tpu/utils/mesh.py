"""Mesh helpers: 3D bounding-box corners from PLY models.

Equivalent of the reference's utils/mesh_utils.py:7-53: ASCII PLY parse,
mm -> m, outlier filter at 0.3 m, robust 1st/99th-percentile box.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..losses.add import _parse_ascii_ply

__all__ = ["load_mesh_corners"]


def load_mesh_corners(mesh_dir: str, obj_id_str: str) -> Optional[np.ndarray]:
    """[8, 3] box corners in meters, or None if the mesh is absent/empty."""
    ply_path = os.path.join(mesh_dir, f"obj_{obj_id_str}.ply")
    if not os.path.exists(ply_path):
        return None

    verts = _parse_ascii_ply(ply_path) / 1000.0
    if verts.size == 0:
        return None
    verts = verts[np.linalg.norm(verts, axis=1) < 0.3]
    if len(verts) == 0:
        return None

    min_pt = np.percentile(verts, 1, axis=0)
    max_pt = np.percentile(verts, 99, axis=0)
    return np.asarray(
        [
            [min_pt[0], min_pt[1], min_pt[2]], [max_pt[0], min_pt[1], min_pt[2]],
            [max_pt[0], max_pt[1], min_pt[2]], [min_pt[0], max_pt[1], min_pt[2]],
            [min_pt[0], min_pt[1], max_pt[2]], [max_pt[0], min_pt[1], max_pt[2]],
            [max_pt[0], max_pt[1], max_pt[2]], [min_pt[0], max_pt[1], max_pt[2]],
        ]
    )
