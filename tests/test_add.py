"""ADD / ADD-S / ADD-0.1d evaluation: parity with the reference semantics.

Uses a synthetic PLY fixture (cube meshes) and checks against a direct numpy
re-statement of models/add_loss.py:156-201.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from pose6d_tpu.geometry import quat_to_mat
from pose6d_tpu.losses import load_object_models, add_metrics
from pose6d_tpu.losses.add import add_loss


def _write_cube_ply(path, half_extent_mm, n=600, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-half_extent_mm, half_extent_mm, size=(n, 3))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("meshes")
    _write_cube_ply(os.path.join(d, "obj_01.ply"), 40.0, seed=1)
    _write_cube_ply(os.path.join(d, "obj_10.ply"), 30.0, seed=2)  # obj_id 9 = symmetric
    with open(os.path.join(d, "models_info.yml"), "w") as f:
        f.write("1: {diameter: 140.0}\n10: {diameter: 105.0}\n")
    return str(d)


def test_load_object_models(model_dir):
    m = load_object_models(model_dir, n_obj=15, num_points=500)
    assert m.points.shape == (15, 500, 3)
    assert m.present[0] and m.present[9]
    assert not m.present[2]
    np.testing.assert_allclose(m.diameters[0], 0.140, atol=1e-6)
    np.testing.assert_allclose(m.diameters[9], 0.105, atol=1e-6)
    assert m.symmetric[9] and m.symmetric[10] and not m.symmetric[0]
    # points are in meters inside the filter radius
    assert np.abs(m.points[0]).max() < 0.5


def _numpy_reference_metrics(points, diameters, sym_ids, pred_q, pred_t, gt_q, gt_t, obj_ids):
    """Direct numpy restatement of the reference eval loop."""
    adds, add_ss, corrects = [], [], []
    for i in range(len(obj_ids)):
        oid = int(obj_ids[i])
        pts = points[oid]
        pr = R.from_quat(pred_q[i]).as_matrix()
        gr = R.from_quat(gt_q[i]).as_matrix()
        gt_pts = pts @ gr.T + gt_t[i]
        pr_pts = pts @ pr.T + pred_t[i]
        add = np.linalg.norm(pr_pts - gt_pts, axis=1).mean()
        pd = np.linalg.norm(pr_pts[:, None] - gt_pts[None, :], axis=2)
        add_s = pd.min(axis=1).mean()
        eff = add_s if oid in sym_ids else add
        adds.append(add)
        add_ss.append(add_s)
        corrects.append(1.0 if eff < 0.1 * diameters[oid] else 0.0)
    return np.mean(adds) * 1000, np.mean(add_ss) * 1000, np.mean(corrects) * 100


def test_add_metrics_match_numpy_reference(model_dir, rng):
    m = load_object_models(model_dir, n_obj=15, num_points=500)
    B = 12
    obj_ids = np.asarray([0, 9] * (B // 2), dtype=np.int32)
    gt_q = R.random(B, rng=5).as_quat().astype(np.float32)
    gt_t = rng.uniform(-0.1, 0.1, size=(B, 3)).astype(np.float32) + np.array([0, 0, 0.8], np.float32)
    # perturbed predictions: some within threshold, some not
    dq = R.from_rotvec(rng.normal(scale=0.08, size=(B, 3))).as_quat().astype(np.float32)
    pred_q = np.stack([(R.from_quat(dq[i]) * R.from_quat(gt_q[i])).as_quat() for i in range(B)]).astype(np.float32)
    pred_t = gt_t + rng.normal(scale=0.01, size=(B, 3)).astype(np.float32)

    ref_add, ref_add_s, ref_acc = _numpy_reference_metrics(
        m.points, m.diameters, {9, 10}, pred_q, pred_t, gt_q, gt_t, obj_ids
    )
    out = add_metrics(
        jnp.asarray(m.points),
        jnp.asarray(m.diameters),
        jnp.asarray(m.symmetric),
        jnp.asarray(m.present),
        quat_to_mat(jnp.asarray(pred_q)),
        jnp.asarray(pred_t),
        quat_to_mat(jnp.asarray(gt_q)),
        jnp.asarray(gt_t),
        jnp.asarray(obj_ids),
    )
    np.testing.assert_allclose(float(out["add_mean"]), ref_add, rtol=1e-3)
    np.testing.assert_allclose(float(out["add_s_mean"]), ref_add_s, rtol=1e-3)
    np.testing.assert_allclose(float(out["add_01d_acc"]), ref_acc, atol=1e-3)


def test_add_metrics_perfect_prediction(model_dir):
    m = load_object_models(model_dir, n_obj=15, num_points=500)
    B = 4
    q = R.random(B, rng=1).as_quat().astype(np.float32)
    t = np.tile(np.array([[0.0, 0.0, 0.9]], np.float32), (B, 1))
    ids = jnp.asarray([0, 0, 9, 9], dtype=jnp.int32)
    out = add_metrics(
        jnp.asarray(m.points), jnp.asarray(m.diameters), jnp.asarray(m.symmetric),
        jnp.asarray(m.present), quat_to_mat(jnp.asarray(q)), jnp.asarray(t),
        quat_to_mat(jnp.asarray(q)), jnp.asarray(t), ids,
    )
    assert float(out["add_mean"]) < 1e-3
    assert float(out["add_01d_acc"]) == 100.0


def test_add_metrics_invalid_ids_masked(model_dir):
    m = load_object_models(model_dir, n_obj=15, num_points=500)
    q = np.array([[0, 0, 0, 1]], np.float32)
    t = np.array([[0, 0, 0.5]], np.float32)
    out = add_metrics(
        jnp.asarray(m.points), jnp.asarray(m.diameters), jnp.asarray(m.symmetric),
        jnp.asarray(m.present), quat_to_mat(jnp.asarray(q)), jnp.asarray(t),
        quat_to_mat(jnp.asarray(q)), jnp.asarray(t), jnp.asarray([5], dtype=jnp.int32),
    )
    # object 5 has no mesh -> masked out, zero metrics and zero count
    assert float(out["count"]) == 0
    assert float(out["add_mean"]) == 0.0


def test_add_loss_differentiable(model_dir):
    import jax

    m = load_object_models(model_dir, n_obj=15, num_points=500)
    q = jnp.asarray(R.random(2, rng=2).as_quat().astype(np.float32))
    t = jnp.asarray(np.array([[0, 0, 0.8], [0, 0, 0.9]], np.float32))
    ids = jnp.asarray([0, 9], dtype=jnp.int32)

    def f(tt):
        return add_loss(
            jnp.asarray(m.points), jnp.asarray(m.symmetric), jnp.asarray(m.present),
            quat_to_mat(q), tt, quat_to_mat(q), t, ids,
        )

    g = jax.grad(f)(t + 0.01)
    assert np.isfinite(np.asarray(g)).all()
    assert float(f(t)) < 1e-6


def test_small_mesh_padding_not_double_weighted(tmp_path):
    # a mesh with fewer than num_points vertices is padded by repetition for
    # static shapes; metrics must average over the REAL points only
    _write_cube_ply(os.path.join(tmp_path, "obj_03.ply"), 25.0, n=120, seed=3)
    m = load_object_models(str(tmp_path), n_obj=5, num_points=500)
    assert m.num_valid[2] == 120
    assert (m.num_valid[[0, 1, 3, 4]] == 500).all()

    rng = np.random.default_rng(0)
    pred_q = R.random(3, random_state=1).as_quat().astype(np.float32)
    gt_q = R.random(3, random_state=2).as_quat().astype(np.float32)
    gt_t = (rng.uniform(-0.05, 0.05, (3, 3)) + [0, 0, 0.8]).astype(np.float32)
    pred_t = gt_t + rng.uniform(-0.01, 0.01, (3, 3)).astype(np.float32)
    obj_ids = np.full(3, 2, np.int32)

    out = add_metrics(
        jnp.asarray(m.points), jnp.asarray(m.diameters), jnp.asarray(m.symmetric),
        jnp.asarray(m.present),
        quat_to_mat(jnp.asarray(pred_q)), jnp.asarray(pred_t),
        quat_to_mat(jnp.asarray(gt_q)), jnp.asarray(gt_t),
        jnp.asarray(obj_ids), num_valid=jnp.asarray(m.num_valid),
    )
    # numpy reference over the unpadded 120-point cloud
    ref_add, ref_add_s, ref_acc = _numpy_reference_metrics(
        m.points[:, :120], m.diameters, set(), pred_q, pred_t, gt_q, gt_t, obj_ids
    )
    np.testing.assert_allclose(float(out["add_mean"]), ref_add, rtol=1e-4)
    np.testing.assert_allclose(float(out["add_s_mean"]), ref_add_s, rtol=1e-4)
    np.testing.assert_allclose(float(out["add_01d_acc"]), ref_acc, atol=1e-5)


def test_mixed_present_absent_batch(model_dir):
    # a batch mixing meshed and mesh-less objects: metrics equal the same
    # batch with the absent samples dropped (reference skips them:
    # add_loss.py:168-172)
    m = load_object_models(model_dir, n_obj=15, num_points=500)
    qs = R.random(4, random_state=7).as_quat().astype(np.float32)
    gq = R.random(4, random_state=8).as_quat().astype(np.float32)
    ts = np.tile(np.array([[0.01, -0.02, 0.7]], np.float32), (4, 1))
    gt = ts + 0.005
    args = (
        jnp.asarray(m.points), jnp.asarray(m.diameters), jnp.asarray(m.symmetric),
        jnp.asarray(m.present),
    )
    mixed = add_metrics(
        *args, quat_to_mat(jnp.asarray(qs)), jnp.asarray(ts),
        quat_to_mat(jnp.asarray(gq)), jnp.asarray(gt),
        jnp.asarray([0, 5, 9, 5], dtype=jnp.int32),  # 5 has no mesh
    )
    sel = [0, 2]
    only_present = add_metrics(
        *args, quat_to_mat(jnp.asarray(qs[sel])), jnp.asarray(ts[sel]),
        quat_to_mat(jnp.asarray(gq[sel])), jnp.asarray(gt[sel]),
        jnp.asarray([0, 9], dtype=jnp.int32),
    )
    assert float(mixed["count"]) == 2
    for k in ("add_mean", "add_s_mean", "add_01d_acc"):
        np.testing.assert_allclose(float(mixed[k]), float(only_present[k]), rtol=1e-5)


def test_add_per_sample_consistent_with_means(model_dir):
    """add_metrics is exactly the masked mean of add_per_sample."""
    import jax.numpy as jnp

    from pose6d_tpu.geometry.quat import quat_to_mat
    from pose6d_tpu.losses.add import ADDEvaluator, add_metrics, add_per_sample

    evaluator = ADDEvaluator(model_dir)

    rng = np.random.default_rng(3)
    B = 16
    q = rng.normal(size=(B, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q2 = rng.normal(size=(B, 4)).astype(np.float32)
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    t = rng.uniform(-0.2, 0.2, (B, 3)).astype(np.float32)
    t2 = t + rng.normal(0, 0.01, (B, 3)).astype(np.float32)
    ids = rng.integers(-1, 15, B).astype(np.int32)  # includes invalid -1

    args = (evaluator.points, evaluator.diameters, evaluator.symmetric,
            evaluator.present, quat_to_mat(jnp.asarray(q)), jnp.asarray(t),
            quat_to_mat(jnp.asarray(q2)), jnp.asarray(t2), jnp.asarray(ids))
    m = add_metrics(*args, num_valid=evaluator.num_valid)
    per = add_per_sample(*args, num_valid=evaluator.num_valid)

    v = np.asarray(per["valid"], dtype=np.float32)
    denom = max(v.sum(), 1.0)
    np.testing.assert_allclose(
        float(m["add_mean"]), 1000 * float((np.asarray(per["add"]) * v).sum() / denom),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(m["add_01d_acc"]), 100 * float((np.asarray(per["correct"]) * v).sum() / denom),
        rtol=1e-5)
