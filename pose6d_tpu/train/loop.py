"""Jitted train/eval steps for the pose networks.

TPU-native redesign of the reference's per-script training loops
(scripts/training/train_rgb.py:95-162 and siblings): the whole step —
on-device augmentation, forward, loss, backward, global-norm clip, AdamW
update, BatchNorm stat update — is ONE jitted function with donated state.
Evaluation fuses forward + batched ADD metrics into a second jit. The host
only feeds batches and runs the plateau scheduler between epochs.

Optimizer: AdamW(lr=1e-4, wd=1e-4) + clip_by_global_norm(1.0)
(train_rgb.py:70,110), with lr exposed via inject_hyperparams so the
host-side ReduceLROnPlateau can set it without recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..geometry.quat import quat_to_mat
from ..losses.add import add_metrics
from ..losses.pose_loss import PoseLossConfig, pose_loss
from ..models.posenet import PoseNet, PoseNetConfig
from ..ops.augment import AugmentConfig, eval_preprocess, train_augment


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    variant: str = "rgb"
    img_size: int = 224
    batch_size: int = 32
    epochs: int = 75
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    loss: PoseLossConfig = PoseLossConfig()
    # plateau scheduler (train_rgb adds min_lr=1e-7; others use 0)
    plateau_factor: float = 0.5
    plateau_patience: int = 5
    min_lr: float = 0.0
    # augmentation; grayscale_p > 0 only for the rgb variant (train_rgb.py:46)
    augment: AugmentConfig = AugmentConfig()
    # ablations (see PoseNetConfig): wide rotation head (geometric + rgbd
    # variants) and the rgbd no-attention concat-fusion probe
    rot_head_wide: bool = False
    fusion_attention: bool = True
    # rgb_geometric z-pathway diagnosis arms (PoseNetConfig docstring)
    z_from_backbone: bool = False
    z_backbone_wide: bool = False
    # rgbd training fix (opt-in, shape-preserving): zero-init the attention
    # out_proj so the residual starts at identity (PoseNetConfig.attn_zero_init)
    attn_zero_init: bool = False
    # mixed-precision training: "bfloat16" runs the model's compute in bf16
    # while params / optimizer state / BN running stats / loss stay f32
    # (standard TPU recipe). On v5e the default-f32 train step measures
    # ~385 ms on device (f32 convs are emulated at ~1/6 bf16 MXU rate);
    # bf16 compute attacks exactly that. Validation always runs f32 so val
    # curves stay comparable across the A/B (make_eval_step).
    compute_dtype: str = "float32"


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    def hyperparams(self):
        return self.opt_state.hyperparams  # from inject_hyperparams


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(learning_rate, weight_decay=cfg.weight_decay),
        )
    )(learning_rate=cfg.learning_rate)


def decompress_batch(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """On-device expansion of a compact batch (see LineMODPoseLoader
    compact_arrays): uint16 'depth_mm' -> float32 depth_raw (meters) +
    normalized depth channel, bit-exact with data.crop.normalize_depth."""
    if "depth_mm" not in batch:
        return batch
    from ..data.crop import DEPTH_INVALID_M, DEPTH_MAX_M, DEPTH_MIN_M

    batch = dict(batch)
    raw = batch.pop("depth_mm").astype(jnp.float32) / 1000.0
    batch["depth_raw"] = raw
    d = jnp.clip((raw - DEPTH_MIN_M) / (DEPTH_MAX_M - DEPTH_MIN_M), 0.0, 1.0)
    batch["depth"] = jnp.where(raw < DEPTH_INVALID_M, 0.0, d)[..., None]
    return batch


def expand_device_batch(
    frames_u8: jax.Array,  # [N, H, W, 3] uint8 OR host-packed [N, R] u32
    depth_u16: Optional[jax.Array],  # [N, H, W] uint16 / packed u32 / None
    batch: Dict[str, jax.Array],  # meta batch (DeviceFrameStore.batches)
    img_size: int,
    frame_hw: Optional[tuple] = None,  # (H, W), required for packed inputs
) -> Dict[str, jax.Array]:
    """On-device half of the preprocessing contract: gather the batch's
    frames from the resident split and run crop+resize as MXU matmuls
    (SURVEY §7 step 9's on-device stage). Produces the same batch fields as
    LineMODPoseLoader (rgb in [0,1] f32, depth normalized, depth_raw meters);
    equality with the cv2 host path is ~1/255 (tests/test_device_pipeline.py),
    exact for all label/bookkeeping fields.

    Resident buffers arrive either raw ([N, H, W, C] narrow dtype) or
    HOST-PACKED as u32 words ([N, R], DeviceFrameStore default) — packing
    on device would materialize a hoisted 4x u32 copy of the whole split
    (the round-3 compile OOM; see ops/gather_frames.pack_frames_host)."""
    from ..data.crop import DEPTH_INVALID_M, DEPTH_MAX_M, DEPTH_MIN_M
    from ..ops.crop_resize import crop_resize_matmul
    from ..ops.gather_frames import gather_frames, gather_frames_packed

    idx = batch["idx"]
    x1, y1, size = batch["x1"], batch["y1"], batch["size"]
    out = dict(batch)
    # Pallas scalar-prefetch gather: O(B) DMA by construction, independent
    # of XLA's narrow-dtype gather lowering (see ops/gather_frames.py; on
    # v5e it and jnp.take both measure ~1 ms/step at batch 32)
    if frames_u8.ndim == 2:
        src = gather_frames_packed(
            frames_u8, idx, (*frame_hw, 3), jnp.uint8)
    else:
        src = gather_frames(frames_u8, idx)
    src = src.astype(jnp.float32)
    out["rgb"] = crop_resize_matmul(src, x1, y1, size, img_size) / 255.0
    if depth_u16 is not None:
        if depth_u16.ndim == 2:
            dsrc = gather_frames_packed(depth_u16, idx, frame_hw, jnp.uint16)
        else:
            dsrc = gather_frames(depth_u16, idx)
        dsrc = dsrc.astype(jnp.float32)[..., None]
        raw = crop_resize_matmul(dsrc, x1, y1, size, img_size)[..., 0] / 1000.0
        out["depth_raw"] = raw
        d = jnp.clip((raw - DEPTH_MIN_M) / (DEPTH_MAX_M - DEPTH_MIN_M), 0.0, 1.0)
        out["depth"] = jnp.where(raw < DEPTH_INVALID_M, 0.0, d)[..., None]
    return out


def model_inputs(variant: str, batch: Dict[str, jax.Array], rgb: jax.Array) -> dict:
    """Wire the per-variant forward signature from the superset batch.

    Matches the reference's calling conventions: rgb_geometric consumes the
    ORIGINAL-frame center + intrinsics (train_rgb_geometric.py:105,
    dataset_rgb.py:96,140-141) while rgbd_geometric consumes the crop-frame
    center + crop intrinsics (train_rgbd_geometric.py:107,
    dataset_rgbd.py:147-169)."""
    kwargs: dict = {"rgb": rgb}
    if variant == "rgb_geometric":
        kwargs["bbox_center"] = batch["center_orig"]
        kwargs["camera_matrix"] = batch["cam_K"]
    elif variant == "rgbd":
        kwargs["depth"] = batch["depth"]
    elif variant == "rgbd_geometric":
        kwargs["depth_raw"] = batch["depth_raw"]
        kwargs["bbox_center"] = batch["center_crop"]
        kwargs["camera_matrix"] = batch["cam_K_crop"]
    return kwargs


def create_train_state(
    cfg: TrainConfig,
    rng: jax.Array,
    model: Optional[PoseNet] = None,
    pretrained_backbone: Optional[str] = None,
):
    """Initialize model + optimizer state with dummy batch shapes.

    `pretrained_backbone` optionally points at a torchvision resnet50
    state_dict (.pth); backbones are then initialized from it (incl. the
    RGBD depth-branch summed-conv1 init)."""
    model = model or PoseNet(PoseNetConfig(variant=cfg.variant, img_size=cfg.img_size,
                                       dtype=jnp.dtype(cfg.compute_dtype).type,
                                       rot_head_wide=cfg.rot_head_wide,
                                       fusion_attention=cfg.fusion_attention,
                                       attn_zero_init=cfg.attn_zero_init,
                                       z_from_backbone=cfg.z_from_backbone,
                                       z_backbone_wide=cfg.z_backbone_wide))
    S = cfg.img_size
    dummy = {
        "rgb": jnp.zeros((2, S, S, 3)),
        "depth": jnp.zeros((2, S, S, 1)),
        "depth_raw": jnp.zeros((2, S, S)),
        "center_orig": jnp.zeros((2, 2)),
        "center_crop": jnp.zeros((2, 2)),
        "cam_K": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        "cam_K_crop": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    kwargs = model_inputs(cfg.variant, dummy, dummy["rgb"])
    if pretrained_backbone is not None:
        from ..models.pretrained import init_posenet_with_pretrained

        variables = init_posenet_with_pretrained(model.config, rng, pretrained_backbone)
    else:
        variables = model.init(rng, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    state = TrainState(params=params, batch_stats=batch_stats, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    return model, tx, state


def _make_core(model: PoseNet, tx: optax.GradientTransformation, cfg: TrainConfig) -> Callable:
    """The un-jitted train-step body: augment, forward, loss, backward,
    clip, AdamW, BN-stat update. Shared by the per-step and whole-epoch
    (lax.scan) drivers."""

    def core(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array):
        k_aug, k_drop = jax.random.split(key)
        rgb = train_augment(k_aug, batch["rgb"], cfg.augment)

        def loss_fn(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                train=True,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
                **model_inputs(cfg.variant, batch, rgb),
            )
            pred_rot, pred_trans = outputs
            # loss in f32 regardless of the model's compute dtype
            loss = pose_loss(pred_rot.astype(jnp.float32),
                             pred_trans.astype(jnp.float32),
                             batch["quat"], batch["trans"], cfg.loss)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        update, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, update)
        new_state = state.replace(
            params=new_params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return core


def make_train_step(
    model: PoseNet,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    device_preprocess: bool = False,
    frame_hw: Optional[tuple] = None,
) -> Callable:
    """Build the jitted train step: (state, batch, key) -> (state, metrics).

    With device_preprocess=True the signature becomes
    (state, frames_u8, depth_u16, batch, key): `batch` is a metadata-only
    batch (DeviceFrameStore) and crop+resize runs inside this jit on the
    device-resident frames (host-packed u32 when frame_hw is given)."""
    core = _make_core(model, tx, cfg)

    if device_preprocess:

        def step_dev(state, frames_u8, depth_u16, batch, key):
            return core(
                state,
                expand_device_batch(
                    frames_u8, depth_u16, batch, cfg.img_size, frame_hw
                ),
                key,
            )

        return jax.jit(step_dev, donate_argnums=0)

    def step(state, batch, key):
        return core(state, decompress_batch(batch), key)

    return jax.jit(step, donate_argnums=0)


def make_train_epoch(
    model: PoseNet,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    frame_hw: Optional[tuple] = None,
) -> Callable:
    """Whole-epoch train function: ONE dispatch per epoch.

    Measured on the tunneled v5e chip, per-step dispatch costs ~0.35 s
    regardless of payload — 105 steps/epoch = 37 s of pure round-trip while
    the device idles (PERF.md). With the split device-resident
    (DeviceFrameStore) the per-step host contribution is a few hundred bytes
    of crop scalars, so the entire epoch rolls into a single jitted
    lax.scan: (state, frames, depth, meta_scan, keys) -> (state, losses),
    where meta_scan leaves are stacked [n_steps, B, ...]. Dispatch overhead
    amortizes across the epoch instead of every step."""
    core = _make_core(model, tx, cfg)

    def epoch_fn(state, frames_u8, depth_u16, meta_scan, keys):
        def body(state, xs):
            meta, key = xs
            batch = expand_device_batch(
                frames_u8, depth_u16, meta, cfg.img_size, frame_hw
            )
            new_state, metrics = core(state, batch, key)
            return new_state, metrics["loss"]

        return jax.lax.scan(body, state, (meta_scan, keys))

    return jax.jit(epoch_fn, donate_argnums=0)


def make_eval_step(model: PoseNet, cfg: TrainConfig, evaluator) -> Callable:
    """Build the jitted eval step: forward + batched ADD metrics.

    `evaluator` is an ADDEvaluator; its device arrays are closed over. The
    'valid' mask excludes padded rows of the final batch, so per-batch means
    match the reference's un-padded batches exactly.

    Validation always runs the model in f32 (sharing the trained params):
    under mixed-precision training (TrainConfig.compute_dtype="bfloat16")
    this keeps val metrics numerically comparable to the f32 baseline."""
    if model.config.dtype != jnp.float32:
        model = PoseNet(dataclasses.replace(model.config, dtype=jnp.float32))
    points = evaluator.points
    diameters = evaluator.diameters
    symmetric = evaluator.symmetric
    present = evaluator.present
    num_valid = evaluator.num_valid

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        batch = decompress_batch(batch)
        rgb = eval_preprocess(batch["rgb"])
        pred_rot, pred_trans = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            train=False,
            **model_inputs(cfg.variant, batch, rgb),
        )
        obj_ids = jnp.where(batch["valid"], batch["obj_id"], -1)
        metrics = add_metrics(
            points, diameters, symmetric, present,
            quat_to_mat(pred_rot), pred_trans,
            quat_to_mat(batch["quat"]), batch["trans"], obj_ids,
            num_valid=num_valid,
        )
        # Deployment-aligned metric: at inference the learned-translation
        # variants (rgb, rgbd) DISCARD their learned X/Y and re-derive them
        # from predicted Z + bbox center + original K (infer/pipeline.py
        # geometric correction, mirroring the reference's
        # inference_rgb.py:99-104 / inference_rgbd.py:159-164). Val selection
        # on the learned-xy metric therefore ranks checkpoints by a pathway
        # deployment throws away; this second metric scores the corrected
        # translation so a deployment-aligned best checkpoint can be kept.
        # For the geometric variants X/Y are already pinhole-derived, so the
        # correction is the identity and the two metrics coincide.
        if cfg.variant in ("rgb", "rgbd"):
            from ..geometry.pinhole import pinhole_xy_from_z

            trans_deploy = pinhole_xy_from_z(
                pred_trans[:, 2], batch["center_orig"], batch["cam_K"]
            )
            deploy = add_metrics(
                points, diameters, symmetric, present,
                quat_to_mat(pred_rot), trans_deploy,
                quat_to_mat(batch["quat"]), batch["trans"], obj_ids,
                num_valid=num_valid,
            )
            metrics["add_01d_acc_deploy"] = deploy["add_01d_acc"]
        else:
            metrics["add_01d_acc_deploy"] = metrics["add_01d_acc"]
        loss = pose_loss(pred_rot, pred_trans, batch["quat"], batch["trans"], cfg.loss)
        metrics["loss"] = loss
        metrics["pred_rot"] = pred_rot
        metrics["pred_trans"] = pred_trans
        return metrics

    return jax.jit(step)
