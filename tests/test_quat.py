"""Geometry core: quaternion ops vs scipy ground truth ([x,y,z,w] parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from pose6d_tpu.geometry import (
    quat_normalize,
    quat_to_mat,
    mat_to_quat,
    quat_mul,
    quat_conj,
    quat_rotate,
    quat_canonical,
)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_mat_matches_scipy(rng):
    q = random_quats(rng, 64).astype(np.float32)
    ours = np.asarray(quat_to_mat(jnp.asarray(q)))
    scipy_mats = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, scipy_mats, atol=1e-5)


def test_mat_to_quat_matches_scipy_up_to_sign(rng):
    mats = R.random(64, rng=7).as_matrix().astype(np.float32)
    ours = np.asarray(mat_to_quat(jnp.asarray(mats)))
    ref = R.from_matrix(mats).as_quat()
    # quaternions are defined up to sign
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours * sign, ref, atol=1e-4)


def test_quat_mat_round_trip(rng):
    q = random_quats(rng, 128).astype(np.float32)
    q2 = np.asarray(mat_to_quat(quat_to_mat(jnp.asarray(q))))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_mat_to_quat_edge_cases():
    # identity, and 180-degree rotations about each axis (pivot-case coverage)
    mats = np.stack(
        [
            np.eye(3),
            R.from_rotvec([np.pi, 0, 0]).as_matrix(),
            R.from_rotvec([0, np.pi, 0]).as_matrix(),
            R.from_rotvec([0, 0, np.pi]).as_matrix(),
        ]
    ).astype(np.float32)
    ours = np.asarray(mat_to_quat(jnp.asarray(mats)))
    rebuilt = np.asarray(quat_to_mat(jnp.asarray(ours)))
    np.testing.assert_allclose(rebuilt, mats, atol=1e-4)


def test_quat_mul_matches_scipy(rng):
    q1 = random_quats(rng, 32)
    q2 = random_quats(rng, 32)
    ours = np.asarray(quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
    ref = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours * sign, ref, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 16).astype(np.float32)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    ours = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    ref = np.einsum("bij,bj->bi", R.from_quat(q).as_matrix(), v)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_normalize_and_conj_and_canonical(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32)
    qn = np.asarray(quat_normalize(jnp.asarray(q)))
    np.testing.assert_allclose(np.linalg.norm(qn, axis=-1), 1.0, atol=1e-6)
    # conj inverts the rotation
    qc = quat_conj(jnp.asarray(qn))
    ident = np.asarray(quat_mul(jnp.asarray(qn), qc))
    np.testing.assert_allclose(np.abs(ident[:, 3]), 1.0, atol=1e-5)
    np.testing.assert_allclose(ident[:, :3], 0.0, atol=1e-5)
    canon = np.asarray(quat_canonical(jnp.asarray(qn)))
    assert (canon[:, 3] >= 0).all()


def test_quat_ops_jit_and_grad():
    q = jnp.asarray(random_quats(np.random.default_rng(0), 4).astype(np.float32))

    @jax.jit
    def f(q):
        return jnp.sum(quat_to_mat(quat_normalize(q)))

    val = f(q)
    g = jax.grad(f)(q)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
