"""Training loss: geodesic quaternion distance + L1 translation.

Functional jnp re-design of the reference's PoseLoss (models/pose_loss.py):
  loss = rot_weight * geodesic(q_pred, q_gt) + trans_weight * L1(t_pred, t_gt)
with the numerically stable atan2 form of the geodesic distance and the
double-cover sign flip (models/pose_loss.py:30-50). All reductions are batch
means, matching the reference exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..geometry.quat import quat_normalize


@dataclasses.dataclass(frozen=True)
class PoseLossConfig:
    """Loss hyperparameters. Reference trainers all use (1.0, 10.0, 'geodesic')
    (scripts/training/train_rgb.py:73)."""

    rot_weight: float = 1.0
    trans_weight: float = 10.0
    rotation_loss: str = "geodesic"  # 'geodesic' | 'l1'


def geodesic_distance(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Mean geodesic angle between quaternion batches [B, 4] (xyzw).

    Stable near identity: angle = 2 * atan2(||q1 - q2||, ||q1 + q2||), with
    q2 sign-flipped where dot(q1, q2) < 0 to handle the double cover.
    """
    q1 = quat_normalize(q1)
    q2 = quat_normalize(q2)
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    diff_norm = jnp.linalg.norm(q1 - q2, axis=-1)
    sum_norm = jnp.linalg.norm(q1 + q2, axis=-1)
    angle = 2.0 * jnp.arctan2(diff_norm, sum_norm)
    return jnp.mean(angle)


def quaternion_l1(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Double-cover-aware L1 distance between quaternion batches [B, 4]."""
    q1 = quat_normalize(q1)
    q2 = quat_normalize(q2)
    dist_pos = jnp.sum(jnp.abs(q1 - q2), axis=-1)
    dist_neg = jnp.sum(jnp.abs(q1 + q2), axis=-1)
    return jnp.mean(jnp.minimum(dist_pos, dist_neg))


def pose_loss(
    pred_rot: jax.Array,
    pred_trans: jax.Array,
    gt_rot: jax.Array,
    gt_trans: jax.Array,
    config: PoseLossConfig = PoseLossConfig(),
) -> jax.Array:
    """Combined rotation + translation loss (scalar)."""
    if config.rotation_loss == "geodesic":
        rot_loss = geodesic_distance(pred_rot, gt_rot)
    else:
        rot_loss = quaternion_l1(pred_rot, gt_rot)
    trans_loss = jnp.mean(jnp.abs(pred_trans - gt_trans))
    return config.rot_weight * rot_loss + config.trans_weight * trans_loss
