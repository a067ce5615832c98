"""Unified detect -> crop -> pose inference pipeline, one jitted graph.

The reference runs this as four per-variant scripts with a Python loop over
detected boxes and host-side cv2 cropping per box
(scripts/inference/inference_rgb.py:60-142 and siblings). Here the whole
pipeline — YOLO forward, NMS, best-box selection, device crop+resize,
normalization, pose forward, pinhole bookkeeping — compiles into ONE jit on
static shapes, which is what the >=5k frames/sec/chip target requires.

Deployment semantics preserved from the reference:
  - square crop at 1.2x max(w, h) around the detected box, the exact
    training recipe (inference_rgb.py:74-96)
  - "geometric correction": for the learned-translation variants (rgb,
    rgbd), X/Y are re-derived from predicted Z + bbox center + ORIGINAL K
    at deployment (inference_rgb.py:99-104, inference_rgbd.py:159-164), so
    all four variants are geometric in X/Y; only Z provenance differs
  - rgb_geometric consumes original-frame center + original K
    (inference_rgb_geometric.py:104-106); rgbd_geometric consumes crop-frame
    center + crop K (inference_rgbd_geometric.py:144-167)
  - depth: meters + CNN normalization as in the datasets
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.crop import DEPTH_INVALID_M, DEPTH_MAX_M, DEPTH_MIN_M
from ..geometry.pinhole import adjust_intrinsics_for_crop, pinhole_xy_from_z
from ..models.posenet import PoseNet, PoseNetConfig
from ..models.yolo.decode import decode_topk_nms
from ..models.yolo.model import YoloConfig, YoloV8
from ..ops.augment import eval_preprocess
from ..ops.crop_resize import (
    crop_params_from_bbox,
    crop_resize_matmul,
    crop_resize_matmul_windowed,
)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    variant: str = "rgb"
    img_size: int = 224
    det_size: int = 640
    conf_thresh: float = 0.25
    iou_thresh: float = 0.7
    nms_pre_topk: int = 64
    # greedy-NMS fixpoint iterations (decode.nms_fixed): exact for
    # suppression chains up to this depth; None = pre_topk iterations
    # (always exact, but each is a serial device step — the full 64 cost
    # ~1.6 ms/batch at B=128 on v5e, ~6% of the whole pipeline). Real
    # score fields have chains of depth ~<=5; 16 is a 3x-margin bound.
    # tests/test_yolo.py pins 16-iteration equality with the exact run on
    # densely clustered boxes.
    nms_fixpoint_iters: int | None = 16
    # poses estimated per frame: 1 = best box (single-object LineMOD demo);
    # >1 = the reference's loop over every detected box, vectorized
    max_objects: int = 1
    # max_objects=1 decode shortcut: greedy NMS can never suppress the
    # global-argmax candidate, so the best box needs no IoU fixpoint and no
    # pre_topk candidate set — top-1 decode only (decode_topk_nms max_det=1
    # fast path; slot-0 equality pinned in tests/test_yolo.py). Measured
    # motivation: the in-pipeline decode+NMS prefix delta was 2.7-3.0 ms of
    # the 30.2 ms composed rgbd batch (round-4g prefix profile).
    nms_top1_fast: bool = True
    # crop via a per-sample window slice instead of full-frame interp
    # matrices; must exceed the largest expected crop side (LineMOD < 300).
    # None (default) = full-frame path: measured FASTER on v5e (5553 vs
    # 5448 fps at batch 128 — the vmapped dynamic_slice costs more than the
    # smaller contraction saves). The option is useful for larger frames.
    crop_window: int | None = None
    geometric_correction: bool = True  # re-derive X/Y at deployment
    compute_dtype: object = jnp.bfloat16
    # rgbd only: crop the depth map in compute_dtype instead of f32. The
    # rgbd variant consumes only the NORMALIZED depth channel (CNN input),
    # so bf16 interpolation noise (~0.2% of the metric value) is invisible;
    # sharing the crop dtype lets XLA CSE the interpolation matrices with
    # the RGB crop. rgbd_geometric keeps f32 always — its depth is metric
    # (sampled at the bbox center and back-projected).
    depth_crop_bf16: bool = True


class PosePipeline:
    """Holds both models' variables and exposes a jitted __call__."""

    def __init__(
        self,
        pipe_cfg: PipelineConfig,
        yolo_cfg: YoloConfig,
        yolo_variables,
        pose_variables,
        pose_cfg: Optional[PoseNetConfig] = None,
    ):
        self.cfg = pipe_cfg
        self.yolo_cfg = yolo_cfg
        self.yolo = YoloV8(yolo_cfg)
        self.pose_cfg = pose_cfg or PoseNetConfig(
            variant=pipe_cfg.variant, img_size=pipe_cfg.img_size,
            dtype=pipe_cfg.compute_dtype,
        )
        self.posenet = PoseNet(self.pose_cfg)
        self.yolo_variables = yolo_variables
        self.pose_variables = pose_variables
        # variables are ARGUMENTS of the jitted function, not closed-over
        # constants: embedded 28M-param literals bloat the executable and
        # inhibit buffer aliasing (measured ~40% of e2e time)
        self._run = jax.jit(self._run_impl)
        self._input_sharding = None
        # int8 serving mode (quantize_backbones): {tower_name: int8 tree}
        self._quantized = {}
        # folded bf16 serving mode (fold_backbones): {tower: folded tree}
        self._folded = {}

    def shard(self, mesh) -> "PosePipeline":
        """Distribute inference over a device mesh: frames batch-sharded over
        'data', detector weights replicated, pose-net weights replicated with
        Megatron TP on the head MLPs when the mesh has a 'model' axis > 1.
        GSPMD partitions the single jitted graph; collectives ride ICI.
        Frame batches must divide the data-axis size. Returns self."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, shard_params

        self.yolo_variables = shard_params(self.yolo_variables, mesh, tp=False)
        self.pose_variables = shard_params(self.pose_variables, mesh)
        self._mesh = mesh
        self._input_sharding = lambda ndim: NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (ndim - 1)))
        )
        return self

    def quantize_backbones(self, calib_frames, calib_K, calib_depth=None,
                           percentile: float | None = None,
                           include_detector: bool = False):
        """Enable the int8 serving mode: run the FLOAT pipeline once on
        representative frames to harvest each tower's actual input crops,
        calibrate static activation scales on them, and quantize every
        ResNet tower to per-channel int8 (ops/quant.py). Subsequent calls
        run the towers s8 x s8 -> s32 on the MXU (~2x bf16 rate on v5e).
        The float path is untouched until this is called; call with the
        same batch size you will serve (the jit re-traces). Returns self."""
        import numpy as np

        from ..models.posenet_serving import serving_forward  # noqa: F401 (doc)
        from ..ops.quant import quantize_resnet_from_variables

        # harvest tower inputs by re-running the crop stages on host-side
        # jitted graph: easiest exact source is the float pipeline's own
        # intermediate — recompute crops with the public crop path
        frames = jnp.asarray(calib_frames)
        camera_K = jnp.asarray(calib_K)
        if camera_K.ndim == 2:
            camera_K = jnp.broadcast_to(camera_K, (frames.shape[0],) + camera_K.shape)
        depth = (jnp.asarray(calib_depth) if calib_depth is not None
                 else jnp.zeros(frames.shape[:3], jnp.float32))
        crops, depth_norm = jax.jit(self._calib_crops)(
            self.yolo_variables, frames, depth
        )

        towers = ({"rgb": "rgb_backbone", "depth": "depth_backbone"}
                  if self.cfg.variant == "rgbd" else {"rgb": "backbone"})
        q = {}
        for src, name in towers.items():
            x = crops if src == "rgb" else depth_norm
            tower_vars = {
                "params": self.pose_variables["params"][name],
                "batch_stats": self.pose_variables["batch_stats"][name],
            }
            q[name] = quantize_resnet_from_variables(
                tower_vars, [np.asarray(x, np.float32)], percentile)
        if include_detector:
            # detector PTQ calibrates on the exact canvas the detect stage
            # consumes (native-res frames/255, or the centered letterbox)
            from ..models.yolo.quant import quantize_yolo_from_variables

            canvas = jax.jit(
                lambda fr: self._letterbox(fr.astype(jnp.float32) / 255.0)[0]
            )(frames)
            q["__yolo__"] = quantize_yolo_from_variables(
                self.yolo_variables, self.yolo_cfg,
                [np.asarray(canvas, np.float32)])
        self._quantized = q
        return self

    def fold_backbones(self, pallas_layer1: bool = False,
                       pallas_stem: bool = False,
                       pallas_stages: tuple = ()):
        """Enable the folded bf16 SERVING mode: BN folds into the conv
        weights of every ResNet tower (inference-only identity — removes
        all BN elementwise work from the serving graph) and the towers run
        through the explicit eval forward (models/posenet_serving.py) with
        compute-dtype activations and f32 MXU accumulation. With
        pallas_layer1 / pallas_stem (img_size 224 only), the bandwidth-bound
        layer1 / conv1+maxpool stages run as fused VMEM-resident Pallas
        kernels (ops/pallas_block.py).
        No calibration needed; the float path is untouched until called.
        Accuracy gate: scripts/eval_e2e.py --folded-backbone. Returns self."""
        from ..ops.quant import fold_bn_resnet

        if ((pallas_layer1 or pallas_stem or pallas_stages)
                and self.cfg.img_size != 224):
            raise ValueError(
                f"pallas_layer1/pallas_stem/pallas_stages require img_size "
                f"224 (56x56 layer1 maps), got {self.cfg.img_size}")
        towers = (("rgb_backbone", "depth_backbone")
                  if self.cfg.variant == "rgbd" else ("backbone",))
        fd = {}
        for name in towers:
            tree = fold_bn_resnet(self.pose_variables["params"][name],
                                  self.pose_variables["batch_stats"][name])
            cd = self.cfg.compute_dtype
            dev_tree = {
                k: {"w": jnp.asarray(v["w"], cd if cd != jnp.float32
                                     else jnp.float32),
                    "b": jnp.asarray(v["b"], jnp.float32)}
                for k, v in tree.items()
            }
            entry = {"tree": dev_tree}
            if pallas_layer1:
                from ..ops.pallas_block import pack_layer1_weights

                entry["pallas_l1"] = pack_layer1_weights(
                    tree, self.cfg.compute_dtype)
            if pallas_stem:
                from ..ops.pallas_block import pack_stem_weights

                entry["pallas_stem"] = pack_stem_weights(
                    tree, self.cfg.compute_dtype)
            if pallas_stages:
                from ..ops.pallas_block import pack_stage_weights

                entry["pallas_stages"] = {
                    n: pack_stage_weights(tree, n, self.cfg.compute_dtype)
                    for n in pallas_stages
                }
            fd[name] = entry
        self._folded = fd
        return self

    def _calib_crops(self, yolo_variables, frames, depth_raw_full):
        """Replicate the pipeline's crop stage to harvest calibration
        inputs (RGB crops after eval_preprocess; normalized depth crops)."""
        cfg = self.cfg
        S = cfg.img_size
        frames_norm = frames.astype(jnp.float32) / 255.0
        bbox_xywh, _ = self._detect_best(yolo_variables, frames_norm)
        bbox = bbox_xywh[:, 0]
        cx1, cy1, csize = crop_params_from_bbox(bbox)
        crops = crop_resize_matmul(frames_norm, cx1, cy1, csize, S,
                                   compute_dtype=jnp.float32)
        crops = eval_preprocess(crops)
        dcrop = crop_resize_matmul(
            depth_raw_full[..., None], cx1, cy1, csize, S,
            compute_dtype=jnp.float32)[..., 0]
        dn = (dcrop - DEPTH_MIN_M) / (DEPTH_MAX_M - DEPTH_MIN_M)
        dn = jnp.clip(dn, 0.0, 1.0)
        dn = jnp.where(dcrop < DEPTH_INVALID_M, 0.0, dn)
        return crops, dn[..., None]

    # ------------------------------------------------------------------ core

    def _letterbox(self, frames_norm):
        """Detector input canvas: native resolution when dims divide the
        coarsest stride, else the standard centered letterbox at det_size.
        Returns (canvas, scale, pad_l, pad_t, det_hw)."""
        B, H, W, _ = frames_norm.shape
        stride = max(self.yolo_cfg.strides)
        if H % stride == 0 and W % stride == 0:
            return frames_norm, 1.0, 0, 0, (H, W)
        D = self.cfg.det_size
        scale = min(D / W, D / H)
        nh, nw = int(round(H * scale)), int(round(W * scale))
        pad_t = (D - nh) // 2
        pad_l = (D - nw) // 2
        resized = jax.image.resize(frames_norm, (B, nh, nw, 3), "bilinear")
        canvas = jnp.full((B, D, D, 3), 114.0 / 255.0, frames_norm.dtype)
        canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, pad_t, pad_l, 0))
        return canvas, scale, pad_l, pad_t, (D, D)

    def _detect_best(self, yolo_variables, frames_norm, yolo_q=None):
        """YOLO -> NMS -> best box per image, in original-frame coordinates.

        When the frame dims divide the coarsest stride (LineMOD 640x480
        does), the fully-convolutional detector runs at NATIVE resolution —
        no letterbox canvas, no coordinate unmapping, ~25% fewer conv FLOPs
        and two full-frame copies saved. Otherwise falls back to the
        standard centered letterbox at det_size."""
        canvas, scale, pad_l, pad_t, det_hw = self._letterbox(frames_norm)

        if yolo_q is not None:
            # int8 serving mode for the detector (models/yolo/quant.py)
            from ..models.yolo.quant import yolo_int8_forward

            outputs = yolo_int8_forward(yolo_q, self.yolo_cfg, canvas,
                                        compute_dtype=self.cfg.compute_dtype)
        else:
            outputs = self.yolo.apply(yolo_variables, canvas)
        # fused decode: top-k preselect BEFORE the DFL box decode — same
        # results, full-field softmax-expectation work dropped (decode.py)
        top1 = self.cfg.max_objects == 1 and self.cfg.nms_top1_fast
        dets = decode_topk_nms(
            outputs, self.yolo_cfg, det_hw,
            max_det=1 if top1 else max(8, self.cfg.max_objects),
            pre_topk=self.cfg.nms_pre_topk,
            iou_thresh=self.cfg.iou_thresh, conf_thresh=self.cfg.conf_thresh,
            fixpoint_iters=self.cfg.nms_fixpoint_iters,
        )
        # all detections mapped back to the original frame, score-ordered
        b = dets["boxes"]  # [B, D, 4] xyxy in det frame
        x1 = (b[..., 0] - pad_l) / scale
        y1 = (b[..., 1] - pad_t) / scale
        x2 = (b[..., 2] - pad_l) / scale
        y2 = (b[..., 3] - pad_t) / scale
        bbox_xywh = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)  # [B, D, 4]
        return bbox_xywh, dets

    def _run_impl(self, yolo_variables, pose_variables, frames, camera_K,
                  depth_raw_full, quantized, folded):
        cfg = self.cfg
        S = cfg.img_size
        # normalize straight into the compute dtype: the uint8 -> f32 full
        # frames are the biggest tensors in the graph; bf16 halves their
        # HBM traffic and both consumers (YOLO, crop matmuls) run bf16.
        # The optimization barrier MATERIALIZES the converted frames: letting
        # XLA fuse the uint8 conversion into the detector's first conv
        # forces a catastrophic layout path (+12.5 ms at batch 64, measured
        # on chip; a hand-written Pallas conversion kernel was also tried
        # and measured SLOWER than XLA's standalone conversion — the uint8
        # (32,128) tiling is the wall, not the op count).
        frames_norm = jax.lax.optimization_barrier(
            frames.astype(cfg.compute_dtype) / 255.0
        )
        B = frames.shape[0]
        M = cfg.max_objects

        all_bbox_xywh, dets = self._detect_best(
            yolo_variables, frames_norm, quantized.get("__yolo__"))
        # top-M score-ordered detections per frame, flattened to a [B*M]
        # pose batch (the reference's per-box Python loop, vectorized:
        # inference_rgb.py:70)
        bbox_xywh = all_bbox_xywh[:, :M].reshape(B * M, 4)
        cls_id = dets["classes"][:, :M].reshape(B * M)
        det_score = dets["scores"][:, :M].reshape(B * M)
        det_valid = dets["valid"][:, :M].reshape(B * M)
        camera_K_m = jnp.repeat(camera_K, M, axis=0) if M > 1 else camera_K

        cx1, cy1, csize = crop_params_from_bbox(bbox_xywh)

        def crop_one(src, xs, ys, ss, dtype, scale):
            if cfg.crop_window is not None and cfg.crop_window < min(
                src.shape[1], src.shape[2]
            ):
                return crop_resize_matmul_windowed(
                    src, xs, ys, ss, S, cfg.crop_window, compute_dtype=dtype,
                    src_scale=scale,
                )
            return crop_resize_matmul(src, xs, ys, ss, S, compute_dtype=dtype,
                                      src_scale=scale)

        def crop_frames(src, dtype, scale=1.0):
            # each of the M crops reads the SAME source frame; loop over the
            # (small, static) M instead of materializing repeated frames
            outs = [
                crop_one(
                    src, cx1.reshape(B, M)[:, m], cy1.reshape(B, M)[:, m],
                    csize.reshape(B, M)[:, m], dtype, scale,
                )
                for m in range(M)
            ]
            return jnp.stack(outs, axis=1).reshape(B * M, S, S, src.shape[-1])

        # matmul formulation: bilinear resample as two MXU matmuls (gathers
        # are slow on TPU). The crop reads the already-normalized bf16
        # frames; cropping the raw uint8 frames with 1/255 folded into the
        # interpolation matrix was tried and measured ~1% SLOWER e2e (the
        # uint8 (32,128) tiling wall again — see the barrier note above).
        crops = crop_frames(frames_norm, cfg.compute_dtype)
        crops = eval_preprocess(crops).astype(cfg.compute_dtype)

        center_orig = jnp.stack(
            [bbox_xywh[:, 0] + bbox_xywh[:, 2] / 2.0, bbox_xywh[:, 1] + bbox_xywh[:, 3] / 2.0],
            axis=-1,
        )
        scale = S / jnp.maximum(csize, 1.0)
        # crop-frame bookkeeping (dataset_rgbd.py:147-169); device path never
        # materializes padding, so pad terms are zero and x1 may be negative
        K_crop = adjust_intrinsics_for_crop(
            camera_K_m, cx1, cy1, jnp.zeros_like(cx1), jnp.zeros_like(cy1), scale
        )
        center_crop = jnp.stack(
            [
                jnp.clip((center_orig[:, 0] - cx1) * scale, 0, S - 1),
                jnp.clip((center_orig[:, 1] - cy1) * scale, 0, S - 1),
            ],
            axis=-1,
        )

        kwargs = {"rgb": crops}
        if cfg.variant == "rgb_geometric":
            kwargs["bbox_center"] = center_orig
            kwargs["camera_matrix"] = camera_K_m
        elif cfg.variant in ("rgbd", "rgbd_geometric"):
            depth_dtype = (
                cfg.compute_dtype
                if (cfg.variant == "rgbd" and cfg.depth_crop_bf16)
                else jnp.float32
            )
            depth_crop = crop_frames(
                depth_raw_full[..., None].astype(depth_dtype), depth_dtype
            )[..., 0]
            if cfg.variant == "rgbd":
                dn = (depth_crop - DEPTH_MIN_M) / (DEPTH_MAX_M - DEPTH_MIN_M)
                dn = jnp.clip(dn, 0.0, 1.0)
                dn = jnp.where(depth_crop < DEPTH_INVALID_M, 0.0, dn)
                kwargs["depth"] = dn[..., None].astype(cfg.compute_dtype)
            else:
                kwargs["depth_raw"] = depth_crop
                kwargs["bbox_center"] = center_crop
                kwargs["camera_matrix"] = K_crop

        if quantized or folded:
            # serving modes: int8 towers (ops/quant.py) and/or the folded
            # bf16 towers (fold_backbones: BN folded into conv weights,
            # optional Pallas fused layer1) through the head-equality-tested
            # serving forward (models/posenet_serving.py)
            from ..models.posenet_serving import serving_forward

            rot, trans = serving_forward(
                pose_variables, self.pose_cfg, quantized=quantized,
                folded=folded, compute_dtype=cfg.compute_dtype, **kwargs,
            )
        else:
            rot, trans = self.posenet.apply(pose_variables, **kwargs)
        rot = rot.astype(jnp.float32)
        trans = trans.astype(jnp.float32)

        if cfg.geometric_correction and cfg.variant in ("rgb", "rgbd"):
            # deployment-time X/Y re-derivation from predicted Z
            trans = pinhole_xy_from_z(trans[:, 2], center_orig, camera_K_m)

        def shape_out(x):
            return x.reshape(B, M, *x.shape[1:]) if M > 1 else x

        return {
            "rotation": shape_out(rot),
            "translation": shape_out(trans),
            "bbox_xywh": shape_out(bbox_xywh),
            "class_id": shape_out(cls_id),
            "det_score": shape_out(det_score),
            "det_valid": shape_out(det_valid),
            "detections": dets,
        }

    # ------------------------------------------------------------------- API

    def __call__(self, frames, camera_K, depth_raw_full=None):
        """frames [B, H, W, 3] uint8; camera_K [B, 3, 3] or [3, 3];
        depth_raw_full [B, H, W] meters (rgbd variants). Returns dict of
        device arrays."""
        frames = jnp.asarray(frames)
        B = frames.shape[0]
        camera_K = jnp.asarray(camera_K)
        if camera_K.ndim == 2:
            camera_K = jnp.broadcast_to(camera_K, (B,) + camera_K.shape)
        if depth_raw_full is None:
            # cached dummy: allocating 10s-of-MB zeros per call costs real
            # dispatch time; the jitted graph DCEs it for depth-free variants
            key = frames.shape[:3]
            if getattr(self, "_zero_depth_shape", None) != key:
                self._zero_depth = jnp.zeros(key, jnp.float32)
                self._zero_depth_shape = key
            depth_raw_full = self._zero_depth
        depth_raw_full = jnp.asarray(depth_raw_full)
        if self._input_sharding is not None:
            put = lambda x: jax.device_put(x, self._input_sharding(x.ndim))
            frames, camera_K, depth_raw_full = (
                put(frames), put(camera_K), put(depth_raw_full),
            )
        return self._run(
            self.yolo_variables, self.pose_variables, frames, camera_K,
            depth_raw_full, self._quantized, self._folded,
        )
