"""Pinhole-camera geometry: the reference's central inductive bias.

The "geometric" pose variants derive translation from camera intrinsics:
X = (u - cx) * Z / fx, Y = (v - cy) * Z / fy (reference:
models/pose_net_rgb_geometric.py:93-109, models/pose_net_rgbd_geometric.py:56-85).
All functions are pure jnp, batched, and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .quat import quat_to_mat

# Canonical LineMOD intrinsics (reference: utils/camera.py:8-12).
DEFAULT_K = np.array(
    [
        [572.4114, 0.0, 325.2611],
        [0.0, 573.57043, 242.04899],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


def pinhole_xy_from_z(
    z: jax.Array, bbox_center: jax.Array, camera_matrix: jax.Array
) -> jax.Array:
    """Back-project pixel (u, v) at depth z to camera-frame translation [B, 3].

    Args:
      z: [B] or [B, 1] depth in meters.
      bbox_center: [B, 2] pixel coordinates (u, v).
      camera_matrix: [B, 3, 3] or [3, 3] intrinsics.
    """
    z = z.reshape(z.shape[0], -1)[:, :1]  # [B, 1]
    if camera_matrix.ndim == 2:
        camera_matrix = jnp.broadcast_to(camera_matrix, (z.shape[0], 3, 3))
    fx = camera_matrix[:, 0, 0:1]
    fy = camera_matrix[:, 1, 1:2]
    cx = camera_matrix[:, 0, 2:3]
    cy = camera_matrix[:, 1, 2:3]
    u = bbox_center[:, 0:1]
    v = bbox_center[:, 1:2]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    return jnp.concatenate([x, y, z], axis=-1)


def project_points(
    points_3d: jax.Array,
    rotation: jax.Array,
    translation: jax.Array,
    camera_matrix: jax.Array,
    z_min: float = 0.001,
) -> jax.Array:
    """Project 3D model points into pixel coordinates.

    jnp analogue of the reference's utils/visualization.py:8-32. Accepts
    rotation as a quaternion [..., 4] (xyzw) or matrix [..., 3, 3];
    points_3d [..., N, 3]; returns float pixels [..., N, 2] (the host viz
    layer casts to int).
    """
    if rotation.shape[-1] == 4 and rotation.ndim == translation.ndim:
        r_mat = quat_to_mat(rotation)
    else:
        r_mat = rotation
    p_cam = jnp.einsum("...ij,...nj->...ni", r_mat, points_3d) + translation[..., None, :]
    z = jnp.clip(p_cam[..., 2], z_min, None)
    fx = camera_matrix[..., 0, 0]
    fy = camera_matrix[..., 1, 1]
    cx = camera_matrix[..., 0, 2]
    cy = camera_matrix[..., 1, 2]
    u = p_cam[..., 0] * fx[..., None] / z + cx[..., None]
    v = p_cam[..., 1] * fy[..., None] / z + cy[..., None]
    return jnp.stack([u, v], axis=-1)


def adjust_intrinsics_for_crop(
    camera_matrix: jax.Array,
    x1: jax.Array,
    y1: jax.Array,
    pad_l: jax.Array,
    pad_t: jax.Array,
    scale: jax.Array,
) -> jax.Array:
    """Intrinsics for a square crop + resize of the original frame.

    Mirrors the reference's bookkeeping (data/dataset_rgbd.py:158-169):
    cx' = (cx + pad_l - x1) * s, fx' = fx * s, where x1/y1 are the crop
    origin in the *padded* frame. Batched over leading axis; scalars
    broadcast.
    """
    fx = camera_matrix[..., 0, 0]
    fy = camera_matrix[..., 1, 1]
    cx = camera_matrix[..., 0, 2]
    cy = camera_matrix[..., 1, 2]
    cx_crop = (cx + pad_l - x1) * scale
    cy_crop = (cy + pad_t - y1) * scale
    fx_crop = fx * scale
    fy_crop = fy * scale
    zeros = jnp.zeros_like(fx_crop)
    ones = jnp.ones_like(fx_crop)
    row0 = jnp.stack([fx_crop, zeros, cx_crop], axis=-1)
    row1 = jnp.stack([zeros, fy_crop, cy_crop], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
