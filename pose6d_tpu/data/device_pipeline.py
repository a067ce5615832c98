"""Device-resident training input pipeline: frames live in HBM, crops on MXU.

Round-2 profiling showed pose training running at ~1% MFU: the chip idled
while one host core did per-sample cv2 crop+resize (the reference's
DataLoader-worker design, data/dataset_rgbd.py:85-206, transplanted to a
1-core host). This module is the TPU-native fix promised by SURVEY §7 step 9:

  - decode every frame of the split ONCE (startup), ship them to HBM as
    compact uint8 RGB [N, H, W, 3] (+ uint16 depth [N, H, W]) — LineMOD-scale
    splits fit comfortably (fixture ~3.9 GB, 16 GB HBM);
  - per step, the host does only SCALAR work: sample indices, bbox jitter,
    and the crop bookkeeping of data/crop.py (vectorized float64 numpy,
    same int() truncation semantics) — microseconds, a few hundred bytes H2D;
  - the jitted train step gathers the batch's frames from the resident
    array and runs crop+resize as batched MXU matmuls
    (ops/crop_resize.crop_resize_matmul), fused by XLA with the augmentation
    and the forward pass.

The host path (data/pipeline.py + cv2) stays the golden reference: device
crops are f32 bilinear over uint8 sources, cv2 rounds to uint8 after
interpolating in fixed point, so eval-path equality holds to ~1/255 per
channel (tested in tests/test_device_pipeline.py). Validation keeps using
the host loader so val metrics stay bit-comparable across rounds.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from .crop import CROP_EXPANSION
from .pipeline import JITTER, LineMODPoseLoader


def _vector_crop_params(
    bbox_j: np.ndarray,  # [B, 4] jittered (float64)
    bbox_orig: np.ndarray,  # [B, 4]
    img_w: int,
    img_h: int,
    img_size: int,
) -> Dict[str, np.ndarray]:
    """Vectorized compute_crop_params (data/crop.py:62-116) over a batch.

    Returns ORIGINAL-frame crop origins (possibly negative — the device crop
    handles out-of-bounds reads as the reference's zero padding) plus the
    center/intrinsics bookkeeping. Matches the scalar version's int()
    truncations exactly; verified element-wise in tests.
    """
    x, y, w, h = bbox_j.T
    xo, yo, wo, ho = bbox_orig.T

    c_x, c_y = x + w / 2.0, y + h / 2.0
    size_f = np.maximum(w, h) * CROP_EXPANSION
    # int() truncation semantics (toward zero), as in the reference
    x1 = np.trunc(c_x - size_f / 2.0)
    y1 = np.trunc(c_y - size_f / 2.0)
    size = np.trunc(size_f)

    pad_l = np.maximum(0.0, -x1)
    pad_t = np.maximum(0.0, -y1)
    scale = np.where(size > 0, img_size / np.maximum(size, 1.0), 0.0)

    center_orig = np.stack([xo + wo / 2.0, yo + ho / 2.0], axis=-1)
    # center mapped into resized-crop coords: (cx + pad_l - x1_padded) * s
    # with x1_padded = x1 + pad_l, i.e. (cx - x1) * s
    ccx = np.clip((center_orig[:, 0] - x1) * scale, 0, img_size - 1)
    ccy = np.clip((center_orig[:, 1] - y1) * scale, 0, img_size - 1)

    return {
        "x1": x1.astype(np.float32),
        "y1": y1.astype(np.float32),
        "size": size.astype(np.float32),
        "scale": scale.astype(np.float32),
        "pad_l": pad_l.astype(np.float32),
        "pad_t": pad_t.astype(np.float32),
        "center_orig": center_orig.astype(np.float32),
        "center_crop": np.stack([ccx, ccy], axis=-1).astype(np.float32),
    }


def _vector_adjust_K(cam_K: np.ndarray, p: Dict[str, np.ndarray]) -> np.ndarray:
    """Vectorized adjust_K_for_crop (data/crop.py:104-116): cx' =
    (cx + pad_l - x1_padded) * s = (cx - x1) * s with original-frame x1."""
    B = cam_K.shape[0]
    K = np.zeros((B, 3, 3), dtype=np.float32)
    s = p["scale"]
    K[:, 0, 0] = cam_K[:, 0, 0] * s
    K[:, 1, 1] = cam_K[:, 1, 1] * s
    K[:, 0, 2] = (cam_K[:, 0, 2] - p["x1"]) * s
    K[:, 1, 2] = (cam_K[:, 1, 2] - p["y1"]) * s
    K[:, 2, 2] = 1.0
    return K


class DeviceFrameStore:
    """Decode a split once, keep its frames device-resident, and yield
    metadata-only batches (indices + crop scalars + labels) for the
    device-preprocessing train step (train.loop.make_train_step with
    frames=...).

    Built FROM a LineMODPoseLoader so the index scan, split logic, and depth
    requirements are shared with the host path.
    """

    def __init__(self, loader: LineMODPoseLoader, device=None):
        import cv2
        import jax

        self.img_size = loader.img_size
        self.flavor = loader.flavor
        self.with_depth = loader.with_depth
        self.augment_bbox = loader.augment_bbox
        self.samples = loader.samples
        if not self.samples:
            raise ValueError("empty split")

        # probe frame geometry; the store requires a uniform frame size
        first = cv2.imread(self.samples[0].img_path)
        if first is None:
            raise FileNotFoundError(self.samples[0].img_path)
        self.frame_h, self.frame_w = first.shape[:2]

        N = len(self.samples)
        rgb = np.empty((N, self.frame_h, self.frame_w, 3), dtype=np.uint8)
        depth = (
            np.empty((N, self.frame_h, self.frame_w), dtype=np.uint16)
            if self.with_depth
            else None
        )
        for i, s in enumerate(self.samples):
            bgr = first if i == 0 else cv2.imread(s.img_path)
            if bgr is None or bgr.shape[:2] != (self.frame_h, self.frame_w):
                raise ValueError(f"bad or non-uniform frame: {s.img_path}")
            rgb[i] = bgr[:, :, ::-1]  # BGR -> RGB
            if depth is not None:
                d = (
                    cv2.imread(s.depth_path, cv2.IMREAD_UNCHANGED)
                    if s.depth_path
                    else None
                )
                depth[i] = (
                    d if d is not None
                    else np.zeros((self.frame_h, self.frame_w), np.uint16)
                )

        put = (lambda a: jax.device_put(a, device)) if device else jax.device_put
        # frames ship HOST-PACKED as u32 words ([N, R]) whenever the
        # geometry allows: the in-graph u8->u32 bitcast alternative
        # materializes a 4x expanded copy of the ENTIRE buffer as a hoisted
        # temp (15.8 GB at parity scale -> compile OOM; see
        # ops/gather_frames.pack_frames_host). Odd geometries fall back to
        # the raw array + jnp.take.
        from ..ops.gather_frames import pack_frames_host

        self.frame_shape = (self.frame_h, self.frame_w, 3)
        rgb_words = pack_frames_host(rgb)
        self.rgb_packed = rgb_words is not None
        self.rgb_frames = put(rgb_words if self.rgb_packed else rgb)
        self.depth_packed = False
        self.depth_frames = None
        if depth is not None:
            d_words = pack_frames_host(depth)
            self.depth_packed = d_words is not None
            self.depth_frames = put(d_words if self.depth_packed else depth)

        # per-sample static labels, host numpy (tiny)
        from scipy.spatial.transform import Rotation as _R

        self._bbox = np.stack([s.bbox for s in self.samples]).astype(np.float64)
        self._quat = np.stack(
            [_R.from_matrix(s.rot_mat).as_quat() for s in self.samples]
        ).astype(np.float32)
        self._trans = np.stack(
            [s.trans_mm / 1000.0 for s in self.samples]
        ).astype(np.float32)
        self._obj_id = np.asarray([s.obj_id for s in self.samples], np.int32)
        self._cam_K = np.stack([s.cam_K for s in self.samples]).astype(np.float32)

    def __len__(self) -> int:
        return len(self.samples)

    def nbytes(self) -> int:
        n = self.rgb_frames.size * self.rgb_frames.dtype.itemsize
        if self.depth_frames is not None:
            n += self.depth_frames.size * self.depth_frames.dtype.itemsize
        return int(n)

    # ---------------------------------------------------------------- batches

    def meta_batch(self, idxs: np.ndarray, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """Host-side scalar work for one batch: jitter + crop bookkeeping."""
        bbox = self._bbox[idxs]
        if self.augment_bbox:
            pos, sc = JITTER[self.flavor]
            B = len(idxs)
            w, h = bbox[:, 2], bbox[:, 3]
            # same per-component int() truncation as crop.jitter_bbox
            jx = np.trunc(rng.uniform(-pos, pos, B) * w)
            jy = np.trunc(rng.uniform(-pos, pos, B) * h)
            sw = np.trunc(rng.uniform(-sc, sc, B) * w)
            sh = np.trunc(rng.uniform(-sc, sc, B) * h)
            bbox_j = np.stack(
                [bbox[:, 0] + jx, bbox[:, 1] + jy, w + sw, h + sh], axis=-1
            )
        else:
            bbox_j = bbox

        p = _vector_crop_params(
            bbox_j, bbox, self.frame_w, self.frame_h, self.img_size
        )
        return {
            "idx": idxs.astype(np.int32),
            "x1": p["x1"],
            "y1": p["y1"],
            "size": p["size"],
            "quat": self._quat[idxs],
            "trans": self._trans[idxs],
            "obj_id": self._obj_id[idxs],
            "center_orig": p["center_orig"],
            "cam_K": self._cam_K[idxs],
            "center_crop": p["center_crop"],
            "cam_K_crop": _vector_adjust_K(self._cam_K[idxs], p),
        }

    def epoch_meta(
        self, batch_size: int, rng: np.random.Generator, shuffle: bool = True
    ):
        """Stack the WHOLE epoch's metadata batches into [n_steps, B, ...]
        arrays for the one-dispatch-per-epoch train function
        (train.loop.make_train_epoch). A full epoch of metadata is a few
        hundred KB — the per-step H2D collapses to nothing and the tunneled
        per-step dispatch RTT (~0.35 s, the real round-2 wall) amortizes
        across the epoch."""
        batches = [
            {k: v for k, v in b.items() if k != "valid"}
            for b in self.batches(batch_size, rng, shuffle=shuffle,
                                  drop_remainder=True)
        ]
        if not batches:
            return None, 0
        return (
            {k: np.stack([b[k] for b in batches]) for k in batches[0]},
            len(batches),
        )

    def batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        shuffle: bool = True,
        drop_remainder: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Same iteration contract as LineMODPoseLoader.batches, but each
        yielded batch is a few KB of metadata instead of ~30 MB of pixels."""
        order = np.arange(len(self.samples))
        if shuffle:
            rng.shuffle(order)
        n = len(order)
        for start in range(0, n, batch_size):
            chunk = order[start : start + batch_size]
            n_valid = len(chunk)
            if n_valid < batch_size:
                if drop_remainder:
                    break
                chunk = np.concatenate(
                    [chunk, np.full(batch_size - n_valid, chunk[-1])]
                )
            batch = self.meta_batch(chunk, rng)
            valid = np.zeros(batch_size, dtype=bool)
            valid[:n_valid] = True
            batch["valid"] = valid
            yield batch
