"""Host-side input pipeline: decode + crop on CPU threads, augment on device.

Replaces the reference's torch DataLoader + per-sample cv2 preprocessing
(data/dataset_rgb.py:83-147, data/dataset_rgbd.py:85-206) with a
numpy-native loader that emits fixed-shape batched arrays ready for a single
device_put. Photometric augmentation (color jitter / grayscale / normalize /
erasing) intentionally does NOT happen here — it runs on-device inside the
jitted train step (pose6d_tpu.ops.augment), where XLA fuses it for free.

Unlike the reference's two dataset classes, one loader produces the superset
of fields; each variant's train step picks what it consumes:
  rgb          [B, S, S, 3] float32 in [0, 1]
  depth        [B, S, S, 1] float32 normalized (rgbd variant input)
  depth_raw    [B, S, S]    float32 meters
  quat         [B, 4] xyzw, trans [B, 3] meters, obj_id [B] int32
  center_orig  [B, 2] original-frame bbox center (rgb/rgb_geometric contract)
  cam_K        [B, 3, 3] original intrinsics
  center_crop  [B, 2] resized-crop-frame center (rgbd contract)
  cam_K_crop   [B, 3, 3] crop intrinsics
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np
from scipy.spatial.transform import Rotation as _R

from .crop import (
    compute_crop_params,
    adjust_K_for_crop,
    crop_resize_image,
    jitter_bbox,
    normalize_depth,
)
from .linemod import Sample, build_index

# Per-variant bbox jitter (data/dataset_rgb.py:101-110, dataset_rgbd.py:110-118)
JITTER = {"rgb": (0.15, 0.20), "rgbd": (0.05, 0.10)}


class LineMODPoseLoader:
    """Index once; decode/crop per batch on a thread pool."""

    def __init__(
        self,
        data_root: str,
        mode: str = "train",
        flavor: str = "rgb",  # 'rgb' | 'rgbd' (jitter magnitude + depth loading)
        img_size: int = 224,
        augment_bbox: Optional[bool] = None,
        num_workers: int = 8,
        cache_decoded: bool = False,
        compact_arrays: bool = False,
    ):
        # compact_arrays: emit rgb as uint8 and depth as uint16 'depth_mm'
        # instead of float32; the jitted step converts on device
        # (train.loop.decompress_batch) bit-exactly. Quarters the H2D bytes —
        # the dominant per-step cost on tunneled single-CPU hosts.
        self.compact_arrays = compact_arrays
        self.flavor = flavor
        self.img_size = img_size
        self.mode = mode
        self.augment_bbox = (mode == "train") if augment_bbox is None else augment_bbox
        self.with_depth = flavor == "rgbd"
        # optional in-RAM decode cache: PNG decode dominates host time per
        # step on 1-CPU hosts (~10 ms/frame); crops/jitter stay per-epoch.
        # LineMOD-scale memory cost is ~1.7 GB RGB (+0.6 GB depth).
        self.cache_decoded = cache_decoded
        self._decoded: Dict[str, np.ndarray] = {}
        self.samples = build_index(data_root, mode=mode, require_depth=self.with_depth)
        self._pool = ThreadPoolExecutor(max_workers=num_workers) if num_workers > 0 else None
        # single-slot prefetch executor: builds batch N+1 while the consumer's
        # device step N runs (dispatch is async, so the main thread is mostly
        # blocked on device completion — the overlap is real wall-clock).
        # Separate from _pool: make_batch fans out into _pool, and submitting
        # it to the same pool could deadlock with all workers busy.
        self._prefetch = ThreadPoolExecutor(max_workers=1) if num_workers > 0 else None

    def __len__(self) -> int:
        return len(self.samples)

    # ---------------------------------------------------------------- sample

    def load_sample(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        import cv2

        s: Sample = self.samples[idx]

        def decode(path, flags=None):
            if self.cache_decoded and path in self._decoded:
                return self._decoded[path]
            img = cv2.imread(path) if flags is None else cv2.imread(path, flags)
            if self.cache_decoded and img is not None:
                self._decoded[path] = img
            return img

        bgr = decode(s.img_path)
        rgb_image = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        h_img, w_img = rgb_image.shape[:2]

        depth_image = None
        if self.with_depth:
            depth_image = (
                decode(s.depth_path, cv2.IMREAD_UNCHANGED) if s.depth_path else None
            )
            if depth_image is None:
                depth_image = np.zeros((h_img, w_img), dtype=np.uint16)

        bbox = s.bbox
        if self.augment_bbox:
            pos, sc = JITTER[self.flavor]
            bbox_j = jitter_bbox(bbox, rng, pos, sc)
        else:
            bbox_j = bbox

        p = compute_crop_params(bbox_j, bbox, w_img, h_img, self.img_size)
        rgb_crop = crop_resize_image(rgb_image, p)

        out: Dict[str, np.ndarray] = {
            "rgb": rgb_crop if self.compact_arrays else rgb_crop.astype(np.float32) / 255.0,
            "quat": _R.from_matrix(s.rot_mat).as_quat().astype(np.float32),
            "trans": (s.trans_mm / 1000.0).astype(np.float32),
            "obj_id": np.int32(s.obj_id),
            "center_orig": np.asarray(p.center_orig, dtype=np.float32),
            "cam_K": s.cam_K.astype(np.float32),
            "center_crop": np.asarray(p.center_crop, dtype=np.float32),
            "cam_K_crop": adjust_K_for_crop(s.cam_K, p),
        }

        if self.with_depth:
            depth_crop = crop_resize_image(depth_image, p)  # uint16, reference order
            if self.compact_arrays:
                out["depth_mm"] = depth_crop
            else:
                depth_raw_m = depth_crop.astype(np.float32) / 1000.0
                out["depth_raw"] = depth_raw_m
                out["depth"] = normalize_depth(depth_raw_m)[..., None]

        return out

    # ----------------------------------------------------------------- batch

    def batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        shuffle: bool = True,
        drop_remainder: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked fixed-shape batches. With drop_remainder the last
        partial batch is dropped (train); otherwise it is padded by repeating
        the final sample and a boolean 'valid' mask marks real rows (eval)."""
        order = np.arange(len(self.samples))
        if shuffle:
            rng.shuffle(order)

        def make_batch(idxs, n_valid):
            seeds = rng.integers(0, 2**31 - 1, size=len(idxs))
            if self._pool is not None:
                items = list(
                    self._pool.map(
                        lambda a: self.load_sample(a[0], np.random.default_rng(a[1])),
                        zip(idxs, seeds),
                    )
                )
            else:
                items = [
                    self.load_sample(i, np.random.default_rng(sd))
                    for i, sd in zip(idxs, seeds)
                ]
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
            valid = np.zeros(len(idxs), dtype=bool)
            valid[:n_valid] = True
            batch["valid"] = valid
            return batch

        plan = []
        n = len(order)
        for start in range(0, n, batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) < batch_size:
                if drop_remainder:
                    break
                pad = np.full(batch_size - len(chunk), chunk[-1])
                plan.append((np.concatenate([chunk, pad]), len(chunk)))
            else:
                plan.append((chunk, len(chunk)))

        if self._prefetch is None:
            for c in plan:
                yield make_batch(*c)
            return
        # one batch in flight ahead of the consumer; the 1-thread executor
        # serializes make_batch calls, so rng consumption order (and thus
        # augmentation determinism) is unchanged
        fut = None
        for c in plan:
            nxt = self._prefetch.submit(make_batch, *c)
            if fut is not None:
                yield fut.result()
            fut = nxt
        if fut is not None:
            yield fut.result()
