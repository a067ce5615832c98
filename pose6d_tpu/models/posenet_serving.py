"""Serving-side PoseNet forward: explicit eval-mode math over the param tree.

Why this exists: the int8 serving mode (ops/quant.py) replaces the ResNet50
towers with s8 x s8 -> s32 MXU graphs, but the flax `PoseNet` is one
monolithic @nn.compact __call__ — there is no seam to feed externally
computed backbone features into its heads. This module is that seam: pure
functions that consume the SAME variables tree (`PoseNet.init` /
checkpoint layout, models/posenet.py) and reproduce the eval-mode forward
exactly — pinned by tests/test_posenet_serving.py equality tests — while
letting the caller swap each tower between:

  - the flax backbone (float, exact), or
  - `ops.quant.int8_resnet50_forward` (PTQ int8, ~2x MXU rate on v5e).

Heads/fusion/attention stay float (they are <2% of the FLOPs). Dropout is
deterministic-off (eval); BatchNorm uses running stats.

Reference head recipes: models/pose_net_rgb.py:23-50 (BN/ReLU MLP heads),
pose_net_rgbd.py:63-103 (LayerNorm/GELU fusion + heads),
pose_net_rgb_geometric.py:23-65, pose_net_rgbd_geometric.py:28-38.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..geometry.pinhole import pinhole_xy_from_z
from .posenet import PoseNetConfig


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _bn_eval(p, s, x, eps=1e-5):
    return (x - s["mean"]) / jnp.sqrt(s["var"] + eps) * p["scale"] + p["bias"]


def _ln(p, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _mlp_head_eval(params, batch_stats, prefix, x, norms, act):
    """Mirror of posenet._mlp_head in eval mode (dropout off)."""
    i = 0
    while f"{prefix}dense{i}" in params:
        x = _dense(params[f"{prefix}dense{i}"], x)
        if norms[i] == "batch":
            x = _bn_eval(params[f"{prefix}norm{i}"],
                         batch_stats[f"{prefix}norm{i}"], x)
        elif norms[i] == "layer":
            x = _ln(params[f"{prefix}norm{i}"], x)
        x = act(x)
        i += 1
    return _dense(params[f"{prefix}out"], x)


def _cross_attention_eval(p, rgb_feat, depth_feat, num_heads=8):
    B, dim = rgb_feat.shape
    head_dim = dim // num_heads
    q = _dense(p["q_proj"], rgb_feat).reshape(B, num_heads, head_dim)
    k = _dense(p["k_proj"], depth_feat).reshape(B, num_heads, head_dim)
    v = _dense(p["v_proj"], depth_feat).reshape(B, num_heads, head_dim)
    attn = jax.nn.softmax(jnp.einsum("bhd,bgd->bhg", q, k) * head_dim**-0.5, -1)
    out = jnp.einsum("bhg,bgd->bhd", attn, v).reshape(B, dim)
    return _dense(p["out_proj"], out)


def _gelu_head_eval(params, prefix, x):
    """rgbd fused GELU head (posenet.py `head`), eval mode."""
    x = _dense(params[f"{prefix}dense0"], x)
    x = jax.nn.gelu(_ln(params[f"{prefix}norm0"], x))
    x = jax.nn.gelu(_dense(params[f"{prefix}dense1"], x))
    return _dense(params[f"{prefix}out"], x)


def _z_backbone_eval(params, batch_stats, x):
    """ZBackbone (4-conv Z-depth CNN), eval mode — stays float (tiny)."""
    from jax import lax

    def conv(name, x, stride, pad):
        p = params[name]
        y = lax.conv_general_dilated(
            x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + p["bias"]

    def pool(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")

    for i, (stride, pad) in enumerate([(2, 3), (1, 2), (1, 1), (1, 1)]):
        x = conv(f"conv{i}", x, stride, pad)
        x = jax.nn.relu(_bn_eval(params[f"bn{i}"], batch_stats[f"bn{i}"], x))
        x = pool(x)
    return jnp.mean(x, axis=(1, 2))


def _depth_pinhole_eval(cfg: PoseNetConfig, depth_raw, bbox_center, camera_matrix):
    """Mirror of PoseNet._depth_pinhole_translation (eval is identical)."""
    B = depth_raw.shape[0]
    hi = cfg.img_size - 1
    u = jnp.clip(bbox_center[:, 0], 0, hi)
    v = jnp.clip(bbox_center[:, 1], 0, hi)
    u_idx = jnp.clip(u.astype(jnp.int32), 0, hi)
    v_idx = jnp.clip(v.astype(jnp.int32), 0, hi)
    z = depth_raw[jnp.arange(B), v_idx, u_idx]
    z = jnp.where(z > cfg.depth_invalid_thresh, z, cfg.depth_fallback)
    z = jnp.clip(z, cfg.depth_min, cfg.depth_max)
    return pinhole_xy_from_z(z, jnp.stack([u, v], axis=-1), camera_matrix)


def backbone_features(variables: Dict, name: str, x, q: Optional[Dict] = None,
                      compute_dtype=jnp.float32, folded: Optional[Dict] = None):
    """One tower's [B, 2048] features: int8 path when `q` (the quantized
    tree from ops.quant) is given; the folded SERVING path when `folded`
    (a prepared {"tree": ..., "pallas_l1": ...} from
    infer.pipeline.fold_backbones or ops.quant.fold_bn_resnet) is given —
    BN folded into conv weights, activations in compute_dtype, f32 MXU
    accumulation, optional Pallas fused layer1; else the exact folded
    float path recomputed from the variables (f32, equality-tested)."""
    from ..ops.quant import fold_bn_resnet, folded_resnet50_forward, int8_resnet50_forward

    if q is not None:
        return int8_resnet50_forward(q, x, compute_dtype=compute_dtype)
    if folded is not None:
        return folded_resnet50_forward(
            folded["tree"], x, compute_dtype=compute_dtype,
            pallas_l1=folded.get("pallas_l1"),
            pallas_stem=folded.get("pallas_stem"),
            pallas_stages=folded.get("pallas_stages"),
        )
    tree = fold_bn_resnet(variables["params"][name],
                          variables["batch_stats"][name])
    return folded_resnet50_forward(tree, x)


def serving_forward(
    variables: Dict,
    cfg: PoseNetConfig,
    rgb: jax.Array,
    depth: Optional[jax.Array] = None,
    depth_raw: Optional[jax.Array] = None,
    bbox_center: Optional[jax.Array] = None,
    camera_matrix: Optional[jax.Array] = None,
    quantized: Optional[Dict[str, Any]] = None,  # {tower_name: int8 tree}
    compute_dtype=jnp.float32,
    folded: Optional[Dict[str, Any]] = None,  # {tower_name: folded tree}
):
    """Eval-mode PoseNet forward over the variables tree. `quantized` maps
    tower param names ('backbone', 'rgb_backbone', 'depth_backbone') to
    int8 trees, `folded` to prepared bf16 folded trees (quantized wins when
    both name a tower); missing towers run the exact float path. Returns
    (rotation [B,4] unit xyzw, translation [B,3] m) like PoseNet.apply."""
    p = variables["params"]
    s = variables["batch_stats"]
    q = quantized or {}
    fd = folded or {}
    v = cfg.variant
    relu, gelu = jax.nn.relu, jax.nn.gelu

    def tower(name, x):
        return backbone_features(variables, name, x, q.get(name),
                                 compute_dtype,
                                 folded=None if name in q else fd.get(name),
                                 ).astype(jnp.float32)

    if v == "rgb":
        feat = tower("backbone", rgb)
        rot = _mlp_head_eval(p, s, "rot_", feat, ("batch", "batch", "none"), relu)
        trans = _mlp_head_eval(p, s, "trans_", feat, ("batch", "batch", "none"), relu)

    elif v == "rgb_geometric":
        feat = tower("backbone", rgb)
        norms = (("batch", "batch", "none") if cfg.rot_head_wide
                 else ("batch", "batch"))
        rot = _mlp_head_eval(p, s, "rot_", feat, norms, relu)
        z_feat = _z_backbone_eval(p["z_backbone"], s["z_backbone"], rgb)
        z = _mlp_head_eval(p, s, "z_", z_feat, ("none", "none"), relu)
        if bbox_center is not None and camera_matrix is not None:
            trans = pinhole_xy_from_z(z, bbox_center, camera_matrix)
        else:
            zeros = jnp.zeros_like(z)
            trans = jnp.concatenate([zeros, zeros, z], axis=-1)

    elif v == "rgbd":
        rgb_feat = _ln(p["rgb_norm"], tower("rgb_backbone", rgb))
        depth_feat = _ln(p["depth_norm"], tower("depth_backbone", depth))
        if cfg.fusion_attention:
            rgb_enh = rgb_feat + _cross_attention_eval(
                p["cross_attention"], rgb_feat, depth_feat)
        else:
            rgb_enh = rgb_feat
        combined = jnp.concatenate([rgb_enh, depth_feat], axis=-1)
        fused = _dense(p["fusion_dense0"], combined)
        fused = gelu(_ln(p["fusion_norm0"], fused))
        fused = _dense(p["fusion_dense1"], fused)
        fused = gelu(_ln(p["fusion_norm1"], fused))
        if cfg.rot_head_wide:
            rot = _mlp_head_eval(p, s, "rot_", fused,
                                 ("batch", "batch", "none"), relu)
        else:
            rot = _gelu_head_eval(p, "rot_", fused)
        trans = _gelu_head_eval(p, "trans_", fused)

    elif v == "rgbd_geometric":
        feat = tower("backbone", rgb)
        norms = (("batch", "batch", "none") if cfg.rot_head_wide
                 else ("batch", "batch"))
        rot = _mlp_head_eval(p, s, "rot_", feat, norms, relu)
        if depth_raw is not None and bbox_center is not None and camera_matrix is not None:
            trans = _depth_pinhole_eval(cfg, depth_raw, bbox_center, camera_matrix)
        else:
            B = rgb.shape[0]
            trans = jnp.tile(
                jnp.array([[0.0, 0.0, cfg.depth_fallback]], dtype=jnp.float32),
                (B, 1))
    else:
        raise ValueError(f"unknown variant: {v}")

    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-8)
    return rot, trans
