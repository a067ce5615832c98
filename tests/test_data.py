"""Data layer: index/split semantics, crop contract, golden parity.

The golden-parity tests import the reference's dataset classes directly from
/root/reference (read-only, torch-cpu) and assert our loader reproduces the
eval-path preprocessing bit-for-bit on the synthetic fixture. Skipped when
the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

from pose6d_tpu.data.crop import (
    compute_crop_params,
    adjust_K_for_crop,
    normalize_depth,
)
from pose6d_tpu.data.linemod import build_index, split_of_index
from pose6d_tpu.data.pipeline import LineMODPoseLoader
from pose6d_tpu.data.synthetic import generate_synthetic_linemod

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("linemod")
    paths = generate_synthetic_linemod(str(root), obj_ids=(1, 2), frames_per_obj=20, seed=3)
    return paths


def test_split_semantics():
    assert [split_of_index(i) for i in range(10)] == [
        "train"] * 8 + ["val", "test"]


def test_index_counts(synth):
    train = build_index(synth["data"], "train")
    val = build_index(synth["data"], "val")
    test = build_index(synth["data"], "test")
    assert len(train) == 32 and len(val) == 4 and len(test) == 4
    assert {s.obj_id for s in train} == {0, 1}
    s = train[0]
    assert s.rot_mat.shape == (3, 3) and s.cam_K.shape == (3, 3)


def test_crop_params_reference_formulas():
    # hand-checked case: bbox [100, 80, 60, 40] in a 640x480 image
    bbox = np.array([100.0, 80.0, 60.0, 40.0])
    p = compute_crop_params(bbox, bbox, 640, 480, 224)
    # size = 1.2 * 60 = 72; center (130, 100); x1 = int(130-36) = 94
    assert p.size == 72 and p.x1 == 94 and p.y1 == 64
    assert p.pad_l == p.pad_t == p.pad_r == p.pad_b == 0
    np.testing.assert_allclose(p.scale, 224 / 72)
    np.testing.assert_allclose(p.center_orig, (130.0, 100.0))
    # center in crop: (130-94)*s, (100-64)*s
    np.testing.assert_allclose(p.center_crop, (36 * 224 / 72, 36 * 224 / 72))


def test_crop_params_padding_at_border():
    bbox = np.array([-10.0, -5.0, 50.0, 50.0])
    p = compute_crop_params(bbox, bbox, 640, 480, 224)
    # x1 = int(15 - 30) = -15 -> pad_l 15, padded-frame origin 0
    assert p.pad_l == 15 and p.x1 == 0
    assert p.y1 >= 0
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    Kc = adjust_K_for_crop(K, p)
    np.testing.assert_allclose(Kc[0, 0], 500.0 * p.scale, rtol=1e-6)
    np.testing.assert_allclose(Kc[0, 2], (320 + p.pad_l - p.x1) * p.scale, rtol=1e-6)


def test_loader_shapes(synth):
    loader = LineMODPoseLoader(synth["data"], mode="val", flavor="rgbd", num_workers=0)
    rng = np.random.default_rng(0)
    batch = next(loader.batches(4, rng, shuffle=False, drop_remainder=False))
    assert batch["rgb"].shape == (4, 224, 224, 3)
    assert batch["depth"].shape == (4, 224, 224, 1)
    assert batch["depth_raw"].shape == (4, 224, 224)
    assert batch["quat"].shape == (4, 4)
    assert batch["trans"].shape == (4, 3)
    assert batch["cam_K_crop"].shape == (4, 3, 3)
    assert batch["rgb"].min() >= 0.0 and batch["rgb"].max() <= 1.0
    assert batch["valid"].all()
    # quats are unit; translations are plausible (z in [0.6, 1.1] by construction)
    np.testing.assert_allclose(np.linalg.norm(batch["quat"], axis=-1), 1.0, atol=1e-5)
    assert (batch["trans"][:, 2] > 0.5).all() and (batch["trans"][:, 2] < 1.2).all()


def test_loader_padding_mask(synth):
    loader = LineMODPoseLoader(synth["data"], mode="val", flavor="rgb", num_workers=0)
    rng = np.random.default_rng(0)
    batches = list(loader.batches(3, rng, shuffle=False, drop_remainder=False))
    assert len(batches) == 2  # 4 samples -> 3 + 1(padded)
    assert batches[-1]["valid"].sum() == 1


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT), reason="reference checkout absent")
def test_golden_parity_rgb_eval_path(synth):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from data.dataset_rgb import LineMODDatasetRGB
    finally:
        sys.path.remove(REFERENCE_ROOT)

    ref = LineMODDatasetRGB(synth["data"], mode="val", transform=None, augment_bbox=False)
    ours = LineMODPoseLoader(synth["data"], mode="val", flavor="rgb", num_workers=0)
    assert len(ref) == len(ours)
    rng = np.random.default_rng(0)
    for idx in range(len(ref)):
        r_rgb, r_quat, r_trans, r_oid, r_center, r_K = ref[idx]
        o = ours.load_sample(idx, rng)
        np.testing.assert_array_equal((o["rgb"] * 255.0).round().astype(np.uint8), r_rgb)
        np.testing.assert_allclose(o["quat"], r_quat.numpy(), atol=1e-6)
        np.testing.assert_allclose(o["trans"], r_trans.numpy(), atol=1e-6)
        assert int(o["obj_id"]) == int(r_oid)
        np.testing.assert_allclose(o["center_orig"], r_center.numpy(), atol=1e-5)
        np.testing.assert_allclose(o["cam_K"], r_K.numpy(), atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT), reason="reference checkout absent")
def test_golden_parity_rgbd_eval_path(synth):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from data.dataset_rgbd import LineMODDatasetRGBD
    finally:
        sys.path.remove(REFERENCE_ROOT)

    ref = LineMODDatasetRGBD(synth["data"], mode="val", transform=None, augment_bbox=False)
    ours = LineMODPoseLoader(synth["data"], mode="val", flavor="rgbd", num_workers=0)
    assert len(ref) == len(ours)
    rng = np.random.default_rng(0)
    for idx in range(len(ref)):
        (r_rgb, r_depth, r_depth_raw, r_quat, r_trans, r_oid, r_center, r_K) = ref[idx]
        o = ours.load_sample(idx, rng)
        np.testing.assert_array_equal((o["rgb"] * 255.0).round().astype(np.uint8), r_rgb)
        np.testing.assert_allclose(
            o["depth"][..., 0], r_depth.numpy()[0], atol=1e-6
        )
        np.testing.assert_allclose(o["depth_raw"], r_depth_raw.numpy(), atol=1e-6)
        np.testing.assert_allclose(o["center_crop"], r_center.numpy(), atol=1e-4)
        np.testing.assert_allclose(o["cam_K_crop"], r_K.numpy(), rtol=1e-5)


def test_normalize_depth_contract():
    d = np.array([0.0, 0.005, 0.1, 0.85, 1.6, 2.0], np.float32)
    n = normalize_depth(d)
    np.testing.assert_allclose(n, [0.0, 0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)


def test_get_gt_and_K_matches_index(synth):
    # the frame-lookup utility must agree with the bulk index scan
    from pose6d_tpu.utils.camera import DEFAULT_K, get_gt_and_K

    s = build_index(synth["data"], "train")[0]
    frame_id = int(os.path.basename(s.img_path).split(".")[0])
    obj_folder = f"{s.obj_id + 1:02d}"
    r, t, K = get_gt_and_K(synth["data"], obj_folder, frame_id)
    np.testing.assert_allclose(r, s.rot_mat, atol=1e-9)
    np.testing.assert_allclose(t, s.trans_mm / 1000.0, atol=1e-9)
    np.testing.assert_allclose(K, s.cam_K, atol=1e-4)

    # unannotated frame: pose is None, K falls back (file or DEFAULT_K)
    r2, t2, K2 = get_gt_and_K(synth["data"], obj_folder, 10_000)
    assert r2 is None and t2 is None and K2.shape == (3, 3)
    # missing folder: both fall back
    r3, t3, K3 = get_gt_and_K(synth["data"], "99", 0)
    assert r3 is None and np.allclose(K3, DEFAULT_K)


def test_bounded_rotation_within_ball():
    from pose6d_tpu.data.synthetic import _bounded_rotation

    rng = np.random.default_rng(0)
    for _ in range(50):
        R = _bounded_rotation(rng, 75.0)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) > 0.99
        angle = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
        assert angle <= 75.0 + 1e-6
