"""Device-resident training pipeline: DeviceFrameStore + expand_device_batch.

The host path (data/pipeline.py + cv2, golden-tested against the reference)
stays the reference implementation; these tests pin the device path to it:
scalar crop bookkeeping must match compute_crop_params EXACTLY, pixel crops
within bilinear-vs-cv2-fixed-point tolerance (~1/255), labels bit-for-bit.
"""

import numpy as np
import pytest

from pose6d_tpu.data.crop import adjust_K_for_crop, compute_crop_params
from pose6d_tpu.data.device_pipeline import (
    DeviceFrameStore,
    _vector_adjust_K,
    _vector_crop_params,
)
from pose6d_tpu.data.pipeline import LineMODPoseLoader
from pose6d_tpu.data.synthetic import generate_synthetic_linemod


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("linemod_dev")
    return generate_synthetic_linemod(
        str(root), obj_ids=(1, 2), frames_per_obj=20, seed=5,
        img_w=320, img_h=240,
    )


def test_vector_crop_params_matches_scalar(rng):
    """The vectorized bookkeeping reproduces compute_crop_params including
    int() truncation, padding and edge clipping (negative origins too)."""
    img_w, img_h, S = 320, 240, 224
    bboxes = []
    for _ in range(64):
        w = rng.uniform(10, 300)
        h = rng.uniform(10, 220)
        x = rng.uniform(-40, img_w - w / 2)
        y = rng.uniform(-40, img_h - h / 2)
        bboxes.append([x, y, w, h])
    bboxes = np.asarray(bboxes, dtype=np.float64)

    p = _vector_crop_params(bboxes, bboxes, img_w, img_h, S)
    K = np.array([[300.0, 0, 160.0], [0, 301.0, 120.0], [0, 0, 1]], np.float32)
    Kb = np.tile(K, (len(bboxes), 1, 1))
    Kc = _vector_adjust_K(Kb, p)

    for i, bb in enumerate(bboxes):
        ps = compute_crop_params(bb, bb, img_w, img_h, S)
        # scalar path reports the PADDED-frame origin; vector path the
        # original-frame origin: x1_orig = x1_padded - pad_l
        assert p["x1"][i] == ps.x1 - ps.pad_l
        assert p["y1"][i] == ps.y1 - ps.pad_t
        assert p["size"][i] == ps.size
        np.testing.assert_allclose(p["center_orig"][i], ps.center_orig, rtol=1e-6)
        np.testing.assert_allclose(p["center_crop"][i], ps.center_crop, atol=1e-4)
        np.testing.assert_allclose(Kc[i], adjust_K_for_crop(K, ps), atol=2e-3)


def test_store_matches_host_loader_eval_path(synth):
    """Deterministic (no-jitter) comparison: device crops within bilinear
    tolerance of cv2, all metadata/label fields equal."""
    import jax.numpy as jnp

    from pose6d_tpu.train.loop import expand_device_batch

    host = LineMODPoseLoader(
        synth["data"], mode="val", flavor="rgbd", augment_bbox=False,
        num_workers=0,
    )
    store = DeviceFrameStore(
        LineMODPoseLoader(
            synth["data"], mode="val", flavor="rgbd", augment_bbox=False,
            num_workers=0,
        )
    )
    assert len(store) == len(host)

    rng = np.random.default_rng(0)
    hb = next(host.batches(4, rng, shuffle=False, drop_remainder=False))
    mb = next(store.batches(4, np.random.default_rng(0), shuffle=False,
                            drop_remainder=False))
    # the store ships host-packed u32 words at this geometry
    assert store.rgb_packed and store.depth_packed
    out = expand_device_batch(
        store.rgb_frames, store.depth_frames,
        {k: jnp.asarray(v) for k, v in mb.items()}, store.img_size,
        (store.frame_h, store.frame_w),
    )

    np.testing.assert_array_equal(np.asarray(mb["obj_id"]), hb["obj_id"])
    np.testing.assert_allclose(np.asarray(mb["quat"]), hb["quat"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(mb["trans"]), hb["trans"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(mb["center_orig"]), hb["center_orig"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(mb["center_crop"]), hb["center_crop"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(mb["cam_K_crop"]), hb["cam_K_crop"], atol=5e-3)

    # pixels: device f32 bilinear vs cv2 uint8 fixed-point -> ~1/255;
    # allow 2/255 for accumulated rounding
    rgb_dev = np.asarray(out["rgb"])
    assert rgb_dev.shape == hb["rgb"].shape
    assert np.abs(rgb_dev - hb["rgb"]).max() <= 2.5 / 255.0

    # depth: cv2 resizes uint16 mm (rounds to 1 mm); device interpolates in
    # f32 mm -> within ~1 mm everywhere except nothing (no edge cases here)
    depth_dev = np.asarray(out["depth_raw"])
    assert np.abs(depth_dev - hb["depth_raw"]).max() <= 1.5e-3
    dn_dev = np.asarray(out["depth"])
    assert np.abs(dn_dev - hb["depth"]).max() <= 2e-3


def test_trainer_device_preprocess_smoke(synth, tmp_path):
    """One real epoch through Trainer(device_preprocess=True): runs, learns a
    finite loss, writes metrics, and the resident store reports its size."""
    from pose6d_tpu.ops.augment import AugmentConfig
    from pose6d_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        variant="rgbd_geometric", img_size=64, batch_size=8,
        augment=AugmentConfig(),
    )
    t = Trainer(
        cfg, synth["data"], synth["models"], str(tmp_path / "save"),
        num_workers=0, device_preprocess=True,
    )
    assert t.frame_store is not None and t.frame_store.nbytes() > 0
    rng = np.random.default_rng(0)
    tm = t.train_epoch(0, rng)
    assert np.isfinite(tm["train_loss"])

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
