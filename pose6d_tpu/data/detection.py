"""Detection data: YOLO-format export + in-memory detection loader.

Two jobs:
  1. `prepare_yolo_dataset`: byte-compatible port of the reference's
     scripts/setup/prepare_yolo.py:37-135 — writes images/{split}, labels/
     {split} txt files (normalized cx cy w h) and dataset.yaml with nc=13.
     Kept so external tooling (and ultralytics users) can consume the same
     tree.
  2. `DetectionLoader`: feeds our Flax YOLOv8 directly from the LineMOD
     tree — letterboxed frames + padded gt boxes — skipping the file-copy
     round trip entirely (the TPU-native path).

Class ids follow the reference exactly: the index of the object's folder in
the SORTED folder list (prepare_yolo.py:67), NOT obj_id - 1 — LineMOD has
no folders 03/07, so folder '04' is class 2.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, Iterator, List, Tuple

import numpy as np
import yaml


def convert_bbox_to_yolo(size: Tuple[int, int], box) -> Tuple[float, float, float, float]:
    """Absolute xywh -> normalized cx cy w h (prepare_yolo.py:29-35)."""
    dw = 1.0 / size[0]
    dh = 1.0 / size[1]
    return (
        (box[0] + box[2] / 2.0) * dw,
        (box[1] + box[3] / 2.0) * dh,
        box[2] * dw,
        box[3] * dh,
    )


def _scan_detection_samples(source_root: str) -> Tuple[List[dict], List[str]]:
    """One annotation per image: the folder's own object (prepare_yolo.py:93-97)."""
    from .linemod import split_of_index

    obj_folders = [f for f in sorted(os.listdir(source_root)) if f.isdigit()]
    samples = []
    for obj_folder in obj_folders:
        base = os.path.join(source_root, obj_folder)
        rgb_dir = os.path.join(base, "rgb")
        gt_path = os.path.join(base, "gt.yml")
        if not (os.path.isdir(rgb_dir) and os.path.exists(gt_path)):
            continue
        with open(gt_path, "r") as f:
            gts = yaml.safe_load(f)
        images = sorted(i for i in os.listdir(rgb_dir) if i.endswith(".png"))
        for i, img_name in enumerate(images):
            frame_id = int(img_name.split(".")[0])
            if frame_id not in gts:
                continue
            anno = next(
                (a for a in gts[frame_id] if str(int(a["obj_id"])).zfill(2) == obj_folder),
                None,
            )
            if anno is None:
                continue
            samples.append(
                {
                    "img_path": os.path.join(rgb_dir, img_name),
                    "folder": obj_folder,
                    "class_id": obj_folders.index(obj_folder),
                    "bbox": np.asarray(anno["obj_bb"], np.float32),
                    "split": split_of_index(i),
                    "name": f"{obj_folder}_{img_name}",
                }
            )
    return samples, obj_folders


def _scan_scene_samples(
    scene_root: str, class_names: List[str], max_gt: int
) -> List[dict]:
    """Per-FRAME samples from a multi-object scene tree (the layout
    `generate_synthetic_scene` writes and real LineMOD's folder 02 uses: one
    folder whose gt.yml lists one annotation per object per frame). Every
    annotation whose obj_id maps into `class_names` (the single-object
    dataset's sorted folder list — class ids stay consistent with the
    detector being fine-tuned) fills one GT slot; frames keep the standard
    index-based split so train/val/test never mix."""
    from .linemod import split_of_index

    samples: List[dict] = []
    folders = [f for f in sorted(os.listdir(scene_root)) if f.isdigit()]
    for folder in folders:
        base = os.path.join(scene_root, folder)
        rgb_dir = os.path.join(base, "rgb")
        gt_path = os.path.join(base, "gt.yml")
        if not (os.path.isdir(rgb_dir) and os.path.exists(gt_path)):
            continue
        with open(gt_path, "r") as f:
            gts = yaml.safe_load(f)
        images = sorted(i for i in os.listdir(rgb_dir) if i.endswith(".png"))
        for i, img_name in enumerate(images):
            frame_id = int(img_name.split(".")[0])
            annos = []
            for a in gts.get(frame_id, ()):
                key = str(int(a["obj_id"])).zfill(2)
                if key not in class_names:
                    continue
                annos.append(
                    (np.asarray(a["obj_bb"], np.float32), class_names.index(key))
                )
            if not annos:
                continue
            samples.append(
                {
                    "img_path": os.path.join(rgb_dir, img_name),
                    "folder": folder,
                    "annos": annos[:max_gt],
                    "split": split_of_index(i),
                    "name": f"scene{folder}_{img_name}",
                }
            )
    return samples


def prepare_yolo_dataset(source_root: str, dest_root: str) -> dict:
    """Write the YOLO-format tree. Returns per-split counts."""
    import cv2

    if os.path.exists(dest_root):
        shutil.rmtree(dest_root)
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(dest_root, "images", split), exist_ok=True)
        os.makedirs(os.path.join(dest_root, "labels", split), exist_ok=True)

    samples, obj_folders = _scan_detection_samples(source_root)
    stats = {"train": 0, "val": 0, "test": 0}
    for s in samples:
        split = s["split"]
        dst_img = os.path.join(dest_root, "images", split, s["name"])
        dst_label = os.path.join(
            dest_root, "labels", split, s["name"].replace(".png", ".txt")
        )
        shutil.copy(s["img_path"], dst_img)
        h, w = cv2.imread(s["img_path"]).shape[:2]
        cx, cy, bw, bh = convert_bbox_to_yolo((w, h), s["bbox"])
        with open(dst_label, "w") as f:
            f.write(f"{s['class_id']} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
        stats[split] += 1

    with open(os.path.join(dest_root, "dataset.yaml"), "w") as f:
        f.write(
            f"path: {os.path.abspath(dest_root)} \n"
            "train: images/train\nval: images/val\ntest: images/test\n\n"
            f"nc: {len(obj_folders)}\nnames: {obj_folders}\n"
        )
    return stats


def letterbox_params(w: int, h: int, target: int) -> Tuple[float, int, int]:
    """scale + top/left padding for centered letterbox into target x target."""
    scale = min(target / w, target / h)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    pad_left = (target - nw) // 2
    pad_top = (target - nh) // 2
    return scale, pad_left, pad_top


class DetectionLoader:
    """LineMOD -> letterboxed detection batches for the Flax YOLO trainer."""

    def __init__(
        self,
        source_root: str,
        mode: str = "train",
        img_size: int = 640,
        max_gt: int = 8,
        scene_roots: Tuple[str, ...] = (),
    ):
        samples, obj_folders = _scan_detection_samples(source_root)
        self.samples = [s for s in samples if s["split"] == mode]
        self.class_names = obj_folders
        # multi-object scene trees (per-frame samples, all GT slots) mix in
        # with the single-object frames — class ids stay the source_root's
        for root in scene_roots:
            self.samples += [
                s for s in _scan_scene_samples(root, obj_folders, max_gt)
                if s["split"] == mode
            ]
        self.num_classes = len(obj_folders)
        self.img_size = img_size
        self.max_gt = max_gt
        # single-slot prefetch: build batch N+1 while the device runs step N
        # (same pattern as pipeline.LineMODPoseLoader)
        from concurrent.futures import ThreadPoolExecutor

        self._prefetch = ThreadPoolExecutor(max_workers=1)

    def __len__(self) -> int:
        return len(self.samples)

    def load_sample(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        s = self.samples[idx]
        bgr = cv2.imread(s["img_path"])
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]
        scale, pad_l, pad_t = letterbox_params(w, h, self.img_size)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        resized = cv2.resize(rgb, (nw, nh))
        canvas = np.full((self.img_size, self.img_size, 3), 114, np.uint8)
        canvas[pad_t : pad_t + nh, pad_l : pad_l + nw] = resized

        annos = s.get("annos") or [(s["bbox"], s["class_id"])]
        gt_boxes = np.zeros((self.max_gt, 4), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        gt_mask = np.zeros((self.max_gt,), bool)
        for slot, (bbox, class_id) in enumerate(annos[: self.max_gt]):
            x, y, bw, bh = bbox
            gt_boxes[slot] = (
                x * scale + pad_l,
                y * scale + pad_t,
                (x + bw) * scale + pad_l,
                (y + bh) * scale + pad_t,
            )
            gt_labels[slot] = class_id
            gt_mask[slot] = True
        return {
            # uint8: 4x fewer H2D bytes than float32; the jitted consumers
            # convert on device (ops.augment.to_float01, bit-exact)
            "image": canvas,
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_mask": gt_mask,
        }

    def batches(
        self, batch_size: int, rng: np.random.Generator, shuffle: bool = True,
        drop_remainder: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.samples))
        if shuffle:
            rng.shuffle(order)

        def make_batch(chunk, n_valid):
            items = [self.load_sample(int(i)) for i in chunk]
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
            valid = np.zeros(batch_size, bool)
            valid[:n_valid] = True
            batch["valid"] = valid
            return batch

        plan = []
        n = len(order)
        for start in range(0, n, batch_size):
            chunk = order[start : start + batch_size]
            n_valid = len(chunk)
            if n_valid < batch_size:
                if drop_remainder:
                    break
                chunk = np.concatenate([chunk, np.full(batch_size - n_valid, chunk[-1])])
            plan.append((chunk, n_valid))

        fut = None
        for c in plan:
            nxt = self._prefetch.submit(make_batch, *c)
            if fut is not None:
                yield fut.result()
            fut = nxt
        if fut is not None:
            yield fut.result()
