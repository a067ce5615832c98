"""Pinhole geometry: back-projection, projection, crop-intrinsics adjustment."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from pose6d_tpu.geometry import (
    pinhole_xy_from_z,
    project_points,
    adjust_intrinsics_for_crop,
    DEFAULT_K,
)


def test_pinhole_round_trip():
    # back-project a pixel at depth z, then re-project: must land on the pixel
    K = jnp.asarray(DEFAULT_K)
    centers = jnp.asarray([[320.0, 240.0], [100.0, 400.0], [637.2, 3.5]])
    z = jnp.asarray([0.5, 1.0, 1.5])
    t = pinhole_xy_from_z(z, centers, K)
    assert t.shape == (3, 3)
    ident = jnp.broadcast_to(jnp.eye(3), (3, 3, 3))
    pts = jnp.zeros((3, 1, 3))
    uv = project_points(pts, ident, t, jnp.broadcast_to(K, (3, 3, 3)))
    np.testing.assert_allclose(np.asarray(uv[:, 0, :]), np.asarray(centers), atol=1e-3)


def test_pinhole_principal_point_maps_to_axis():
    K = jnp.asarray(DEFAULT_K)
    c = jnp.asarray([[DEFAULT_K[0, 2], DEFAULT_K[1, 2]]])
    t = pinhole_xy_from_z(jnp.asarray([0.7]), c, K)
    np.testing.assert_allclose(np.asarray(t), [[0.0, 0.0, 0.7]], atol=1e-6)


def test_project_points_matches_reference_formula(rng):
    # reference utils/visualization.py:8-32 with quaternion input
    q = R.random(rng=3).as_quat().astype(np.float32)
    t = np.array([0.05, -0.02, 0.8], dtype=np.float32)
    pts = rng.normal(scale=0.05, size=(50, 3)).astype(np.float32)

    r_mat = R.from_quat(q).as_matrix()
    p_cam = (r_mat @ pts.T).T + t
    z = np.clip(p_cam[:, 2], 0.001, None)
    ref_u = p_cam[:, 0] * DEFAULT_K[0, 0] / z + DEFAULT_K[0, 2]
    ref_v = p_cam[:, 1] * DEFAULT_K[1, 1] / z + DEFAULT_K[1, 2]

    ours = np.asarray(
        project_points(jnp.asarray(pts), jnp.asarray(q), jnp.asarray(t), jnp.asarray(DEFAULT_K))
    )
    np.testing.assert_allclose(ours[:, 0], ref_u, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(ours[:, 1], ref_v, rtol=1e-4, atol=1e-2)


def test_adjust_intrinsics_for_crop():
    # mirror of data/dataset_rgbd.py:158-169
    K = jnp.asarray(DEFAULT_K)[None]
    x1, y1, pad_l, pad_t = 100.0, 50.0, 10.0, 0.0
    scale = 224.0 / 300.0
    out = np.asarray(
        adjust_intrinsics_for_crop(
            K,
            jnp.asarray([x1]),
            jnp.asarray([y1]),
            jnp.asarray([pad_l]),
            jnp.asarray([pad_t]),
            jnp.asarray([scale]),
        )
    )[0]
    np.testing.assert_allclose(out[0, 0], DEFAULT_K[0, 0] * scale, rtol=1e-6)
    np.testing.assert_allclose(out[1, 1], DEFAULT_K[1, 1] * scale, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], (DEFAULT_K[0, 2] + pad_l - x1) * scale, rtol=1e-6)
    np.testing.assert_allclose(out[1, 2], (DEFAULT_K[1, 2] + pad_t - y1) * scale, rtol=1e-6)
    np.testing.assert_allclose(out[2], [0, 0, 1], atol=1e-7)


def test_consistency_pinhole_vs_projection_center():
    # translation from pinhole_xy_from_z projects back to bbox center under
    # the CROP intrinsics — the invariant the geometric variants rely on
    K = jnp.asarray(DEFAULT_K)[None]
    K_crop = adjust_intrinsics_for_crop(
        K, jnp.asarray([120.0]), jnp.asarray([80.0]), jnp.asarray([0.0]),
        jnp.asarray([0.0]), jnp.asarray([224.0 / 256.0]),
    )
    center = jnp.asarray([[112.0, 96.0]])
    t = pinhole_xy_from_z(jnp.asarray([0.9]), center, K_crop)
    uv = project_points(jnp.zeros((1, 1, 3)), jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), t, K_crop)
    np.testing.assert_allclose(np.asarray(uv[:, 0]), np.asarray(center), atol=1e-3)
