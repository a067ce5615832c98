"""Pure-jnp quaternion library in the scipy [x, y, z, w] convention.

The reference pipeline keeps quaternions in scipy's xyzw order end-to-end
(reference: data/dataset_rgb.py:135-136, models/add_loss.py:203-215,
utils/visualization.py:21-24). Every function here is batched over leading
axes, jit/vmap/grad-safe, and static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_normalize(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """L2-normalize quaternions along the last axis (safe at zero)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_canonical(q: jax.Array) -> jax.Array:
    """Flip sign so the scalar (w, last) component is non-negative.

    Resolves the double cover for tests/serialization; rotations are
    unchanged.
    """
    w = q[..., 3:4]
    return jnp.where(w < 0, -q, q)


def quat_conj(q: jax.Array) -> jax.Array:
    """Quaternion conjugate (inverse for unit quaternions)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1*q2, both in xyzw order, batched over leading axes."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.concatenate([x, y, z, w], axis=-1)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Convert xyzw quaternions [..., 4] to rotation matrices [..., 3, 3].

    Same algebra as the reference's ADDLoss._quat_to_mat
    (models/add_loss.py:203-215): assumes (approximately) unit quaternions.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * y2 - 2 * z2, 2 * xy - 2 * wz, 2 * xz + 2 * wy], axis=-1)
    row1 = jnp.stack([2 * xy + 2 * wz, 1 - 2 * x2 - 2 * z2, 2 * yz - 2 * wx], axis=-1)
    row2 = jnp.stack([2 * xz - 2 * wy, 2 * yz + 2 * wx, 1 - 2 * x2 - 2 * y2], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Convert rotation matrices [..., 3, 3] to xyzw quaternions [..., 4].

    Branch-free variant of Shepperd's method: compute the candidate
    quaternion from each of the four diagonal cases and select by the
    largest pivot — jit/vmap-safe with static shapes. Matches
    scipy.spatial.transform.Rotation.as_quat up to quaternion sign.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    # Case w: pivot 1 + tr
    qw_w = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    s_w = 0.25 / jnp.maximum(qw_w, _EPS)
    cand_w = jnp.stack(
        [(m21 - m12) * s_w, (m02 - m20) * s_w, (m10 - m01) * s_w, qw_w], axis=-1
    )
    # Case x: pivot 1 + m00 - m11 - m22
    qx_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    s_x = 0.25 / jnp.maximum(qx_x, _EPS)
    cand_x = jnp.stack(
        [qx_x, (m01 + m10) * s_x, (m02 + m20) * s_x, (m21 - m12) * s_x], axis=-1
    )
    # Case y: pivot 1 - m00 + m11 - m22
    qy_y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    s_y = 0.25 / jnp.maximum(qy_y, _EPS)
    cand_y = jnp.stack(
        [(m01 + m10) * s_y, qy_y, (m12 + m21) * s_y, (m02 - m20) * s_y], axis=-1
    )
    # Case z: pivot 1 - m00 - m11 + m22
    qz_z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    s_z = 0.25 / jnp.maximum(qz_z, _EPS)
    cand_z = jnp.stack(
        [(m02 + m20) * s_z, (m12 + m21) * s_z, qz_z, (m10 - m01) * s_z], axis=-1
    )

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    choice = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, choice[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return quat_normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4] (xyzw)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)
