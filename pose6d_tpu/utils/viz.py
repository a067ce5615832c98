"""Host-side drawing: project 3D boxes/axes and render onto frames.

Equivalent of the reference's utils/visualization.py:8-70. Projection reuses
the jnp geometry core (one source of truth); drawing stays numpy/cv2 on the
host — it is IO, not compute.
"""

from __future__ import annotations

import numpy as np

from ..geometry.pinhole import project_points as _project_jnp

__all__ = ["project_points", "draw_3d_box", "draw_axes"]

_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def project_points(points_3d, rotation, translation, K) -> np.ndarray:
    """[N, 3] + pose + K -> integer pixel coordinates [N, 2]."""
    import jax.numpy as jnp

    rotation = np.asarray(rotation, dtype=np.float32)
    pts = _project_jnp(
        jnp.asarray(np.asarray(points_3d, np.float32)),
        jnp.asarray(rotation),
        jnp.asarray(np.asarray(translation, np.float32)),
        jnp.asarray(np.asarray(K, np.float32)),
    )
    return np.asarray(pts).astype(int)


def draw_3d_box(img, pts_2d, color=(0, 255, 0), thickness=2) -> None:
    """Draw the 12 wireframe edges in-place (expects [8, 2] corners)."""
    import cv2

    for s, e in _EDGES:
        cv2.line(
            img,
            (int(pts_2d[s][0]), int(pts_2d[s][1])),
            (int(pts_2d[e][0]), int(pts_2d[e][1])),
            color,
            thickness,
        )


def draw_axes(img, rotation, translation, K, scale=0.1) -> None:
    """Draw RGB XYZ axes at the object origin in-place."""
    import cv2

    pts = project_points(
        np.asarray([[0, 0, 0], [scale, 0, 0], [0, scale, 0], [0, 0, scale]], np.float32),
        rotation, translation, K,
    )
    origin = tuple(pts[0])
    cv2.line(img, origin, tuple(pts[1]), (0, 0, 255), 3)  # X red
    cv2.line(img, origin, tuple(pts[2]), (0, 255, 0), 3)  # Y green
    cv2.line(img, origin, tuple(pts[3]), (255, 0, 0), 3)  # Z blue
