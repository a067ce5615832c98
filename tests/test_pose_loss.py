"""Training loss parity: geodesic / L1 rotation loss + combined pose loss."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from pose6d_tpu.losses import geodesic_distance, quaternion_l1, pose_loss, PoseLossConfig


def _unit_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_geodesic_zero_for_identical(rng):
    q = _unit_quats(rng, 16)
    d = float(geodesic_distance(jnp.asarray(q), jnp.asarray(q)))
    assert abs(d) < 1e-5


def test_geodesic_zero_for_negated(rng):
    # double cover: -q is the same rotation
    q = _unit_quats(rng, 16)
    d = float(geodesic_distance(jnp.asarray(q), jnp.asarray(-q)))
    assert abs(d) < 1e-5


def test_geodesic_known_angle():
    # The reference's formula 2*atan2(||q1-q2||, ||q1+q2||)
    # (models/pose_loss.py:43-49) measures the angle between the unit
    # 4-vectors, which is HALF the 3D rotation angle. We preserve that
    # scaling exactly — it is the training-loss magnitude the reference's
    # loss weights (1.0 rot / 10.0 trans) were tuned against.
    for theta in [0.1, 0.5, 1.5, np.pi - 0.1]:
        q1 = R.from_rotvec([0, 0, theta]).as_quat().astype(np.float32)[None]
        q0 = np.array([[0, 0, 0, 1]], dtype=np.float32)
        d = float(geodesic_distance(jnp.asarray(q1), jnp.asarray(q0)))
        np.testing.assert_allclose(d, theta / 2.0, atol=1e-4)


def test_geodesic_gradient_finite_near_identity():
    # the atan2 form must not blow up when quats nearly coincide
    q0 = jnp.asarray(np.array([[0.0, 0.0, 0.0, 1.0]], dtype=np.float32))
    q1 = jnp.asarray(np.array([[1e-5, 0.0, 0.0, 1.0]], dtype=np.float32))
    g = jax.grad(lambda a: geodesic_distance(a, q0))(q1)
    assert np.isfinite(np.asarray(g)).all()


def test_quaternion_l1_double_cover(rng):
    q = _unit_quats(rng, 8)
    d = float(quaternion_l1(jnp.asarray(q), jnp.asarray(-q)))
    assert abs(d) < 1e-5


def test_pose_loss_weights(rng):
    q = _unit_quats(rng, 8)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    t2 = t + 0.1
    cfg = PoseLossConfig(rot_weight=1.0, trans_weight=10.0)
    loss = float(pose_loss(jnp.asarray(q), jnp.asarray(t2), jnp.asarray(q), jnp.asarray(t), cfg))
    # rotation term is 0; expect 10 * mean|0.1| = 1.0
    np.testing.assert_allclose(loss, 1.0, atol=1e-4)


def test_pose_loss_jit_grad(rng):
    q1 = jnp.asarray(_unit_quats(rng, 4))
    q2 = jnp.asarray(_unit_quats(rng, 4))
    t1 = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    t2 = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    f = jax.jit(lambda a, b: pose_loss(a, t1, b, t2))
    g = jax.grad(lambda a: pose_loss(a, t1, q2, t2))(q1)
    assert np.isfinite(float(f(q1, q2)))
    assert np.isfinite(np.asarray(g)).all()
