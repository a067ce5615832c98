"""Detection data: prepare_yolo export parity + DetectionLoader."""

import os

import numpy as np
import pytest

from pose6d_tpu.data.detection import (
    DetectionLoader,
    convert_bbox_to_yolo,
    letterbox_params,
    prepare_yolo_dataset,
)
from pose6d_tpu.data.synthetic import generate_synthetic_linemod


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("linemod_det")
    return generate_synthetic_linemod(str(root), obj_ids=(1, 2), frames_per_obj=20, seed=5)


def test_convert_bbox_to_yolo():
    cx, cy, w, h = convert_bbox_to_yolo((640, 480), [100, 80, 60, 40])
    np.testing.assert_allclose([cx, cy, w, h], [130 / 640, 100 / 480, 60 / 640, 40 / 480])


def test_prepare_yolo_dataset(synth, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("yolo_ready"))
    stats = prepare_yolo_dataset(synth["data"], dest)
    assert stats == {"train": 32, "val": 4, "test": 4}
    # structure matches the reference layout
    assert os.path.exists(os.path.join(dest, "dataset.yaml"))
    labels = os.listdir(os.path.join(dest, "labels", "train"))
    assert len(labels) == 32
    with open(os.path.join(dest, "labels", "train", sorted(labels)[0])) as f:
        parts = f.read().split()
    assert len(parts) == 5 and parts[0] == "0"
    vals = [float(p) for p in parts[1:]]
    assert all(0 <= v <= 1 for v in vals)
    with open(os.path.join(dest, "dataset.yaml")) as f:
        content = f.read()
    assert "nc: 2" in content


def test_letterbox_params():
    scale, pl, pt = letterbox_params(640, 480, 640)
    assert scale == 1.0 and pl == 0 and pt == 80


def test_detection_loader(synth):
    loader = DetectionLoader(synth["data"], "train", img_size=320)
    assert len(loader) == 32 and loader.num_classes == 2
    s = loader.load_sample(0)
    assert s["image"].shape == (320, 320, 3)
    assert s["gt_mask"][0] and not s["gt_mask"][1:].any()
    b = s["gt_boxes"][0]
    assert 0 <= b[0] < b[2] <= 320 and 0 <= b[1] < b[3] <= 320
    # the box encloses the bright object: mean intensity inside > outside
    img = s["image"]
    x1, y1, x2, y2 = b.astype(int)
    inside = img[y1:y2, x1:x2].mean()
    assert inside > img.mean()

    rng = np.random.default_rng(0)
    batch = next(loader.batches(8, rng))
    assert batch["image"].shape == (8, 320, 320, 3)
    assert batch["gt_boxes"].shape == (8, 8, 4)


def test_class_id_is_folder_index(synth):
    # folders are 01, 02 -> class ids 0, 1 by sorted index
    loader = DetectionLoader(synth["data"], "train")
    ids = {s["folder"]: s["class_id"] for s in loader.samples}
    assert ids == {"01": 0, "02": 1}


def test_detection_loader_scene_roots(synth, tmp_path_factory):
    # multi-object scene trees mix per-FRAME samples (all GT slots filled)
    # into the single-object stream, with class ids mapped through the
    # single-object folder list — the fine-tune path for multi-object recall
    from pose6d_tpu.data.synthetic import (
        generate_synthetic_scene, recover_object_colors)

    colors = recover_object_colors(synth["data"])
    scene_root = str(tmp_path_factory.mktemp("scene"))
    generate_synthetic_scene(scene_root, {k: colors[k] for k in (1, 2)},
                             frames=10, seed=3, write_models=False)
    base = DetectionLoader(synth["data"], "train", img_size=320)
    loader = DetectionLoader(synth["data"], "train", img_size=320,
                             scene_roots=(os.path.join(scene_root, "data"),))
    assert loader.num_classes == 2  # class list stays the source_root's
    extra = len(loader) - len(base)
    assert extra > 0  # scene frames joined the train split
    s = loader.load_sample(len(loader) - 1)  # scene samples append at the end
    assert s["gt_mask"].sum() == 2  # both objects fill GT slots
    assert set(s["gt_labels"][s["gt_mask"]]) == {0, 1}
    for b in s["gt_boxes"][s["gt_mask"]]:
        assert 0 <= b[0] < b[2] <= 320 and 0 <= b[1] < b[3] <= 320
    # single-object samples are untouched by the mix-in
    s0 = loader.load_sample(0)
    assert s0["gt_mask"].sum() == 1


def test_load_yolo_variables_prefer(tmp_path):
    # eval_e2e --yolo-checkpoint plumbing: a resumed fine-tune's save-dir
    # keeps a pre-fine-tune 'best' (its harder mixed val may never beat the
    # old single-object mAP), so deploying the fine-tuned weights needs
    # prefer='last' to actually load them.
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from pose6d_tpu.models.yolo.train import YoloConfig, load_yolo_variables

    ckpt = ocp.StandardCheckpointer()
    save_dir = tmp_path / "yolo_ckpt"
    for name, val in (("best", 1.0), ("last", 2.0)):
        ckpt.save(str(save_dir / name),
                  {"ema_params": {"w": np.full((4,), val, np.float32)},
                   "batch_stats": {}})
    ckpt.wait_until_finished()

    ycfg = YoloConfig(num_classes=2)
    default = load_yolo_variables(str(save_dir), ycfg)
    pinned = load_yolo_variables(str(save_dir), ycfg, prefer="last")
    assert float(jnp.ravel(default["params"]["w"])[0]) == 1.0
    assert float(jnp.ravel(pinned["params"]["w"])[0]) == 2.0
    # a dir with only 'last' still resolves under the default preference
    import shutil

    shutil.rmtree(save_dir / "best")
    fallback = load_yolo_variables(str(save_dir), ycfg)
    assert float(jnp.ravel(fallback["params"]["w"])[0]) == 2.0
