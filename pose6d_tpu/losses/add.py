"""Batched ADD / ADD-S / ADD-0.1d evaluation on TPU.

The reference computes these metrics with a per-sample Python loop building a
500x500 pairwise-distance matrix per sample on the fly
(models/add_loss.py:156-201). Here the 13 object point clouds are stacked
into one [n_obj, P, 3] array at load time; a whole batch is evaluated inside
a single jit with a gather by obj_id and an MXU-friendly pairwise distance
(|a|^2 + |b|^2 - 2 a.b^T) instead of materializing [B, P, P, 3] differences.

Semantics preserved from the reference:
  - points loaded from ASCII PLY, mm -> m, outlier filter ||p|| < 0.5,
    diameters from models_info.yml (/1000) else max pairwise over <=100
    sampled points, downsample to 500 points (add_loss.py:29-81)
  - symmetric objects (0-indexed ids 9, 10 = eggbox, glue) use ADD-S for the
    ADD-0.1d decision (add_loss.py:10,193-195)
  - returns ADD mm / ADD-S mm / ADD-0.1d % as batch means (add_loss.py:197-201)
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# LineMOD symmetric objects, 0-indexed (eggbox=9, glue=10).
SYMMETRIC_OBJECT_IDS = (9, 10)


def _parse_ascii_ply(path: str) -> np.ndarray:
    """Parse vertex x/y/z columns from an ASCII PLY file."""
    verts = []
    header_end = False
    with open(path, "r") as f:
        for line in f:
            if not header_end:
                if "end_header" in line:
                    header_end = True
                continue
            vals = line.strip().split()
            if len(vals) >= 3:
                verts.append([float(vals[0]), float(vals[1]), float(vals[2])])
    return np.asarray(verts, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class ObjectModels:
    """Stacked object point clouds ready for device-side gather.

    points:    [n_obj, num_points, 3] float32 (meters). Objects with no mesh
               are zero-filled and masked out by `present`.
    diameters: [n_obj] float32 (meters).
    symmetric: [n_obj] bool.
    present:   [n_obj] bool.
    num_valid: [n_obj] int32 — real (non-padded) point count per object.
               Meshes with fewer than num_points post-filter vertices are
               padded by repetition for static shapes; metric means weight
               only the first num_valid points so padding never double-counts.
    """

    points: np.ndarray
    diameters: np.ndarray
    symmetric: np.ndarray
    present: np.ndarray
    num_valid: np.ndarray


def load_object_models(
    model_dir: str,
    n_obj: int = 15,
    num_points: int = 500,
    seed: int = 0,
    symmetric_ids: tuple = SYMMETRIC_OBJECT_IDS,
) -> ObjectModels:
    """Load obj_XX.ply meshes + models_info.yml diameters into stacked arrays."""
    rng = np.random.default_rng(seed)

    official_diameters = {}
    info_path = os.path.join(model_dir, "models_info.yml")
    if os.path.exists(info_path):
        import yaml

        with open(info_path, "r") as f:
            models_info = yaml.safe_load(f)
        for obj_key, obj_data in models_info.items():
            try:
                obj_id = int(obj_key) - 1
            except (TypeError, ValueError):
                continue
            if isinstance(obj_data, dict) and "diameter" in obj_data:
                official_diameters[obj_id] = float(obj_data["diameter"]) / 1000.0

    points = np.zeros((n_obj, num_points, 3), dtype=np.float32)
    diameters = np.full((n_obj,), 0.1, dtype=np.float32)
    present = np.zeros((n_obj,), dtype=bool)
    num_valid = np.full((n_obj,), num_points, dtype=np.int32)

    if os.path.isdir(model_dir):
        for ply_file in sorted(f for f in os.listdir(model_dir) if f.endswith(".ply")):
            try:
                obj_id = int(ply_file.split("_")[1].split(".")[0]) - 1
            except (IndexError, ValueError):
                continue
            if not (0 <= obj_id < n_obj):
                continue
            pts = _parse_ascii_ply(os.path.join(model_dir, ply_file)) / 1000.0
            if pts.size == 0:
                continue
            pts = pts[np.linalg.norm(pts, axis=1) < 0.5]
            if pts.shape[0] == 0:
                continue

            if obj_id in official_diameters:
                diameters[obj_id] = official_diameters[obj_id]
            elif pts.shape[0] > 10:
                sample = pts[rng.choice(pts.shape[0], min(100, pts.shape[0]), replace=False)]
                pairwise = np.linalg.norm(sample[:, None] - sample[None, :], axis=2)
                diameters[obj_id] = float(np.max(pairwise))

            if pts.shape[0] > num_points:
                idx = rng.choice(pts.shape[0], num_points, replace=False)
                pts = pts[idx]
            elif pts.shape[0] < num_points:
                # Pad by repetition for static jit shapes; num_valid records
                # the real count so metric means skip the padded tail.
                num_valid[obj_id] = pts.shape[0]
                idx = rng.choice(pts.shape[0], num_points - pts.shape[0], replace=True)
                pts = np.concatenate([pts, pts[idx]], axis=0)

            points[obj_id] = pts.astype(np.float32)
            present[obj_id] = True

    symmetric = np.zeros((n_obj,), dtype=bool)
    for sid in symmetric_ids:
        if 0 <= sid < n_obj:
            symmetric[sid] = True

    return ObjectModels(
        points=points, diameters=diameters, symmetric=symmetric,
        present=present, num_valid=num_valid,
    )


def _transform_points(points: jax.Array, rot_mat: jax.Array, trans: jax.Array) -> jax.Array:
    """Apply per-sample rigid transform: [B, P, 3] x [B, 3, 3] + [B, 3]."""
    return jnp.einsum("bpj,bij->bpi", points, rot_mat) + trans[:, None, :]


def pairwise_min_dist(pred_pts: jax.Array, gt_pts: jax.Array) -> jax.Array:
    """Nearest-GT distance per predicted point, with per-sample centering
    (translation-invariant; avoids fp32 cancellation at mm scales) and a
    Pallas fast path on TPU that keeps the [P, P] tile in VMEM."""
    center = jnp.mean(gt_pts, axis=1, keepdims=True)
    pred_pts = pred_pts - center
    gt_pts = gt_pts - center
    if jax.default_backend() == "tpu":
        from ..ops.pallas_addmin import pairwise_min_dist_pallas

        return pairwise_min_dist_pallas(pred_pts, gt_pts)
    return _pairwise_min_dist(pred_pts, gt_pts)


def _pairwise_min_dist(pred_pts: jax.Array, gt_pts: jax.Array) -> jax.Array:
    """XLA path: for each predicted point, distance to the nearest GT point
    [B, P], via the squared-distance expansion so the [B, P, P] matrix comes
    from a single batched matmul (MXU) instead of a [B, P, P, 3] subtraction.
    Expects pre-centered inputs (see pairwise_min_dist)."""
    pred2 = jnp.sum(pred_pts * pred_pts, axis=-1)  # [B, P]
    gt2 = jnp.sum(gt_pts * gt_pts, axis=-1)  # [B, P]
    cross = jnp.einsum(
        "bpi,bqi->bpq", pred_pts, gt_pts, preferred_element_type=jnp.float32
    )
    d2 = pred2[:, :, None] + gt2[:, None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    return jnp.sqrt(jnp.min(d2, axis=2))


def _point_mean(per_point: jax.Array, safe_ids: jax.Array, num_valid) -> jax.Array:
    """Mean of [B, P] per-point values over each sample's real points only."""
    if num_valid is None:
        return jnp.mean(per_point, axis=-1)
    nv = num_valid[safe_ids].astype(jnp.float32)  # [B]
    pmask = jnp.arange(per_point.shape[-1])[None, :] < nv[:, None]
    return jnp.sum(jnp.where(pmask, per_point, 0.0), axis=-1) / jnp.maximum(nv, 1.0)


def add_per_sample(
    model_points: jax.Array,  # [n_obj, P, 3]
    diameters: jax.Array,  # [n_obj]
    symmetric: jax.Array,  # [n_obj] bool
    present: jax.Array,  # [n_obj] bool
    pred_rot_mat: jax.Array,  # [B, 3, 3]
    pred_trans: jax.Array,  # [B, 3]
    gt_rot_mat: jax.Array,  # [B, 3, 3]
    gt_trans: jax.Array,  # [B, 3]
    obj_ids: jax.Array,  # [B] int
    num_valid: jax.Array | None = None,  # [n_obj] int, real point count
) -> dict:
    """Per-sample ADD / ADD-S (meters), the 0.1d correctness indicator, and
    the validity mask — the un-aggregated form of `add_metrics`, for
    per-object breakdowns and diagnostics. Fully jittable."""
    obj_ids = obj_ids.astype(jnp.int32)
    n_obj = model_points.shape[0]
    safe_ids = jnp.clip(obj_ids, 0, n_obj - 1)
    valid = (obj_ids >= 0) & (obj_ids < n_obj) & present[safe_ids]

    pts = model_points[safe_ids]  # [B, P, 3]
    diam = diameters[safe_ids]  # [B]
    sym = symmetric[safe_ids]  # [B]

    gt_pts = _transform_points(pts, gt_rot_mat, gt_trans)
    pred_pts = _transform_points(pts, pred_rot_mat, pred_trans)

    add = _point_mean(jnp.linalg.norm(pred_pts - gt_pts, axis=-1), safe_ids, num_valid)  # [B]
    # Padded GT points are repeats of real points, so the min over the GT
    # axis is unaffected; only the pred-point mean needs masking.
    add_s = _point_mean(pairwise_min_dist(pred_pts, gt_pts), safe_ids, num_valid)  # [B]

    effective = jnp.where(sym, add_s, add)
    correct = (effective < 0.1 * diam).astype(jnp.float32)
    return {"add": add, "add_s": add_s, "effective": effective,
            "correct": correct, "valid": valid}


def add_metrics(
    model_points: jax.Array,  # [n_obj, P, 3]
    diameters: jax.Array,  # [n_obj]
    symmetric: jax.Array,  # [n_obj] bool
    present: jax.Array,  # [n_obj] bool
    pred_rot_mat: jax.Array,  # [B, 3, 3]
    pred_trans: jax.Array,  # [B, 3]
    gt_rot_mat: jax.Array,  # [B, 3, 3]
    gt_trans: jax.Array,  # [B, 3]
    obj_ids: jax.Array,  # [B] int
    num_valid: jax.Array | None = None,  # [n_obj] int, real point count
) -> dict:
    """Batched ADD / ADD-S / ADD-0.1d. Pure function, fully jittable.

    Returns dict with 'add_mean' (mm), 'add_s_mean' (mm), 'add_01d_acc' (%),
    each a scalar mean over the valid samples of the batch (0 if none valid),
    matching models/add_loss.py:156-201. When `num_valid` is given, per-point
    means cover only each object's real (non-padded) points — matching the
    reference's variable-size clouds exactly, not just in expectation.
    """
    per = add_per_sample(model_points, diameters, symmetric, present,
                         pred_rot_mat, pred_trans, gt_rot_mat, gt_trans,
                         obj_ids, num_valid=num_valid)
    add, add_s, correct, valid = per["add"], per["add_s"], per["correct"], per["valid"]

    count = jnp.sum(valid)
    denom = jnp.maximum(count, 1)
    vmask = valid.astype(jnp.float32)
    return {
        "add_mean": jnp.sum(add * vmask) / denom * 1000.0,
        "add_s_mean": jnp.sum(add_s * vmask) / denom * 1000.0,
        "add_01d_acc": jnp.sum(correct * vmask) / denom * 100.0,
        "count": count,
    }


def add_loss(
    model_points: jax.Array,
    symmetric: jax.Array,
    present: jax.Array,
    pred_rot_mat: jax.Array,
    pred_trans: jax.Array,
    gt_rot_mat: jax.Array,
    gt_trans: jax.Array,
    obj_ids: jax.Array,
    num_valid: jax.Array | None = None,
) -> jax.Array:
    """Differentiable ADD(-S) loss, the batched analogue of add_loss.py:101-150."""
    obj_ids = obj_ids.astype(jnp.int32)
    n_obj = model_points.shape[0]
    safe_ids = jnp.clip(obj_ids, 0, n_obj - 1)
    valid = (obj_ids >= 0) & (obj_ids < n_obj) & present[safe_ids]

    pts = model_points[safe_ids]
    sym = symmetric[safe_ids]
    gt_pts = _transform_points(pts, gt_rot_mat, gt_trans)
    pred_pts = _transform_points(pts, pred_rot_mat, pred_trans)

    add = _point_mean(jnp.linalg.norm(pred_pts - gt_pts, axis=-1), safe_ids, num_valid)
    add_s = _point_mean(pairwise_min_dist(pred_pts, gt_pts), safe_ids, num_valid)
    per_sample = jnp.where(sym, add_s, add)

    vmask = valid.astype(jnp.float32)
    return jnp.sum(per_sample * vmask) / jnp.maximum(jnp.sum(vmask), 1.0)


class ADDEvaluator:
    """Holds device-resident object models and exposes jitted metric calls.

    TPU-native replacement for the reference's ADDLoss module: loads once,
    then every batch is one fused device computation (no per-sample host
    loop, no .item() syncs).
    """

    def __init__(self, model_dir: str, n_obj: int = 15, num_points: int = 500, seed: int = 0):
        models = load_object_models(model_dir, n_obj=n_obj, num_points=num_points, seed=seed)
        self.points = jnp.asarray(models.points)
        self.diameters = jnp.asarray(models.diameters)
        self.symmetric = jnp.asarray(models.symmetric)
        self.present = jnp.asarray(models.present)
        self.num_valid = jnp.asarray(models.num_valid)
        self.host_models = models

    @functools.partial(jax.jit, static_argnums=0)
    def eval_metrics_from_quat(self, pred_q, pred_t, gt_q, gt_t, obj_ids):
        from ..geometry.quat import quat_to_mat

        return add_metrics(
            self.points,
            self.diameters,
            self.symmetric,
            self.present,
            quat_to_mat(pred_q),
            pred_t,
            quat_to_mat(gt_q),
            gt_t,
            obj_ids,
            num_valid=self.num_valid,
        )

    def eval_metrics(self, pred_q, pred_t, gt_q, gt_t, obj_ids) -> dict:
        """Host-friendly wrapper returning Python floats (reference API parity)."""
        out = self.eval_metrics_from_quat(pred_q, pred_t, gt_q, gt_t, obj_ids)
        return {k: float(v) for k, v in out.items()}
