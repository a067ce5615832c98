"""Full-model weight interop: reference torch PoseNet* <-> pose6d_tpu PoseNet.

The reference publishes trained .pth checkpoints for its four pose variants
(fetched by its scripts/setup/setup_weights.py). This module converts those
state_dicts onto our unified `PoseNet` parameter tree — and back — so a
reference user can run their existing weights under this framework (and
export ours into theirs). Structure references:

  rgb:             models/pose_net_rgb.py:14-54   (backbone, rot/trans_head)
  rgb_geometric:   models/pose_net_rgb_geometric.py:14-68
                   (rgb_backbone, rot_head, z_backbone, z_predictor)
  rgbd:            models/pose_net_rgbd.py:8-116  (dual backbones, norms,
                   cross_attention, fusion, GELU heads)
  rgbd_geometric:  models/pose_net_rgbd_geometric.py:15-38 (backbone, rot_head)

The torch models wrap torchvision's resnet50 in nn.Sequential, so backbone
keys are positional (`backbone.0.*` = conv1, `.1` = bn1, `.4`-`.7` =
layer1-4); heads are nn.Sequential of Linear/BatchNorm1d/LayerNorm/Conv2d
at fixed indices. Layout rules are the same as models/convert.py:
  linear  torch [O, I]        <-> flax kernel [I, O]
  conv    torch [O, I, kh, kw] <-> flax kernel [kh, kw, I, O]
  bn/ln   weight <-> scale, bias <-> bias, running stats <-> batch_stats

Correctness is golden-tested by importing the reference's own model classes
and asserting forward parity (tests/test_posenet_torch_golden.py).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .convert import _to_np, torchvision_resnet50_to_flax

# nn.Sequential(*list(resnet.children())[:-1]) index -> torchvision name
_SEQ_TO_TV = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
              "6": "layer3", "7": "layer4"}
_TV_TO_SEQ = {v: k for k, v in _SEQ_TO_TV.items()}

# Per-variant declarative maps: (flax param name, torch module prefix).
# "seq" entries: (flax backbone name, torch Sequential attribute).
_MAPS = {
    "rgb": {
        "seq": [("backbone", "backbone")],
        "linear": [("rot_dense0", "rot_head.0"), ("rot_dense1", "rot_head.4"),
                   ("rot_dense2", "rot_head.8"), ("rot_out", "rot_head.10"),
                   ("trans_dense0", "trans_head.0"), ("trans_dense1", "trans_head.4"),
                   ("trans_dense2", "trans_head.8"), ("trans_out", "trans_head.10")],
        "bn": [("rot_norm0", "rot_head.1"), ("rot_norm1", "rot_head.5"),
               ("trans_norm0", "trans_head.1"), ("trans_norm1", "trans_head.5")],
        "ln": [],
        "conv": [],
    },
    "rgb_geometric": {
        "seq": [("backbone", "rgb_backbone")],
        "linear": [("rot_dense0", "rot_head.0"), ("rot_dense1", "rot_head.4"),
                   ("rot_out", "rot_head.8"),
                   ("z_dense0", "z_predictor.0"), ("z_dense1", "z_predictor.3"),
                   ("z_out", "z_predictor.5")],
        "bn": [("rot_norm0", "rot_head.1"), ("rot_norm1", "rot_head.5"),
               (("z_backbone", "bn0"), "z_backbone.1"),
               (("z_backbone", "bn1"), "z_backbone.5"),
               (("z_backbone", "bn2"), "z_backbone.9"),
               (("z_backbone", "bn3"), "z_backbone.13")],
        "ln": [],
        "conv": [(("z_backbone", "conv0"), "z_backbone.0"),
                 (("z_backbone", "conv1"), "z_backbone.4"),
                 (("z_backbone", "conv2"), "z_backbone.8"),
                 (("z_backbone", "conv3"), "z_backbone.12")],
    },
    "rgbd": {
        "seq": [("rgb_backbone", "rgb_backbone"), ("depth_backbone", "depth_backbone")],
        "linear": [(("cross_attention", "q_proj"), "cross_attention.q_proj"),
                   (("cross_attention", "k_proj"), "cross_attention.k_proj"),
                   (("cross_attention", "v_proj"), "cross_attention.v_proj"),
                   (("cross_attention", "out_proj"), "cross_attention.out_proj"),
                   ("fusion_dense0", "fusion.0"), ("fusion_dense1", "fusion.4"),
                   ("rot_dense0", "rot_head.0"), ("rot_dense1", "rot_head.4"),
                   ("rot_out", "rot_head.6"),
                   ("trans_dense0", "trans_head.0"), ("trans_dense1", "trans_head.4"),
                   ("trans_out", "trans_head.6")],
        "bn": [],
        "ln": [("rgb_norm", "rgb_norm"), ("depth_norm", "depth_norm"),
               ("fusion_norm0", "fusion.1"), ("fusion_norm1", "fusion.5"),
               ("rot_norm0", "rot_head.1"), ("trans_norm0", "trans_head.1")],
        "conv": [],
    },
    "rgbd_geometric": {
        "seq": [("backbone", "backbone")],
        "linear": [("rot_dense0", "rot_head.0"), ("rot_dense1", "rot_head.4"),
                   ("rot_out", "rot_head.8")],
        "bn": [("rot_norm0", "rot_head.1"), ("rot_norm1", "rot_head.5")],
        "ln": [],
        "conv": [],
    },
}


def _path(entry):
    return entry if isinstance(entry, tuple) else (entry,)


def _set(tree: dict, path, leaf: dict):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _resnet_sd_from_sequential(sd: Mapping, seq_attr: str) -> dict:
    """Strip `<seq_attr>.<idx>.` positional keys to torchvision names."""
    out = {}
    pref = seq_attr + "."
    for key, val in sd.items():
        if not key.startswith(pref):
            continue
        rest = key[len(pref):]
        idx, _, tail = rest.partition(".")
        if idx in _SEQ_TO_TV:
            out[_SEQ_TO_TV[idx] + ("." + tail if tail else "")] = val
    return out


# ------------------------------------------------------------- torch -> flax


def posenet_torch_to_flax(variant: str, state_dict: Mapping) -> dict:
    """Convert a reference PoseNet* state_dict to PoseNet variables.

    Returns {"params": ..., "batch_stats": ...} matching
    `PoseNet(PoseNetConfig(variant=...)).init(...)`.
    """
    m = _MAPS[variant]
    params: dict = {}
    stats: dict = {}

    for flax_name, seq_attr in m["seq"]:
        tv_sd = _resnet_sd_from_sequential(state_dict, seq_attr)
        bb_params, bb_stats = torchvision_resnet50_to_flax(tv_sd)
        params[flax_name] = bb_params
        stats[flax_name] = bb_stats

    for entry, tpfx in m["linear"]:
        _set(params, _path(entry), {
            "kernel": _to_np(state_dict[tpfx + ".weight"]).T,
            "bias": _to_np(state_dict[tpfx + ".bias"]),
        })
    for entry, tpfx in m["conv"]:
        _set(params, _path(entry), {
            "kernel": np.transpose(_to_np(state_dict[tpfx + ".weight"]), (2, 3, 1, 0)),
            "bias": _to_np(state_dict[tpfx + ".bias"]),
        })
    for entry, tpfx in m["bn"]:
        _set(params, _path(entry), {
            "scale": _to_np(state_dict[tpfx + ".weight"]),
            "bias": _to_np(state_dict[tpfx + ".bias"]),
        })
        _set(stats, _path(entry), {
            "mean": _to_np(state_dict[tpfx + ".running_mean"]),
            "var": _to_np(state_dict[tpfx + ".running_var"]),
        })
    for entry, tpfx in m["ln"]:
        _set(params, _path(entry), {
            "scale": _to_np(state_dict[tpfx + ".weight"]),
            "bias": _to_np(state_dict[tpfx + ".bias"]),
        })
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------- flax -> torch


def _resnet_flax_to_tv(params: dict, stats: dict) -> dict:
    """Inverse of torchvision_resnet50_to_flax (torchvision key names)."""

    def conv_w(k):
        return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))

    def bn(dst, name, p, s):
        dst[name + ".weight"] = np.asarray(p["scale"])
        dst[name + ".bias"] = np.asarray(p["bias"])
        dst[name + ".running_mean"] = np.asarray(s["mean"])
        dst[name + ".running_var"] = np.asarray(s["var"])
        dst[name + ".num_batches_tracked"] = np.asarray(0, np.int64)

    sd: dict = {"conv1.weight": conv_w(params["conv1"]["kernel"])}
    bn(sd, "bn1", params["bn1"], stats["bn1"])
    for stage_idx, n_blocks in enumerate((3, 4, 6, 3)):
        for block_idx in range(n_blocks):
            fname = f"layer{stage_idx + 1}_{block_idx}"
            tpfx = f"layer{stage_idx + 1}.{block_idx}."
            bp, bs = params[fname], stats[fname]
            for ci in (1, 2, 3):
                sd[tpfx + f"conv{ci}.weight"] = conv_w(bp[f"conv{ci}"]["kernel"])
                bn(sd, tpfx + f"bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample_conv" in bp:
                sd[tpfx + "downsample.0.weight"] = conv_w(bp["downsample_conv"]["kernel"])
                bn(sd, tpfx + "downsample.1", bp["downsample_bn"], bs["downsample_bn"])
    return sd


def posenet_flax_to_torch(variant: str, variables: Mapping) -> dict:
    """Export PoseNet variables to a reference-keyed state_dict (numpy values;
    wrap with torch.from_numpy to load into the reference classes)."""
    m = _MAPS[variant]
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}

    for flax_name, seq_attr in m["seq"]:
        for tv_key, val in _resnet_flax_to_tv(params[flax_name], stats[flax_name]).items():
            name, _, tail = tv_key.partition(".")
            sd[f"{seq_attr}.{_TV_TO_SEQ[name]}.{tail}"] = val

    for entry, tpfx in m["linear"]:
        leaf = _get(params, _path(entry))
        sd[tpfx + ".weight"] = np.ascontiguousarray(np.asarray(leaf["kernel"]).T)
        sd[tpfx + ".bias"] = np.asarray(leaf["bias"])
    for entry, tpfx in m["conv"]:
        leaf = _get(params, _path(entry))
        sd[tpfx + ".weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(leaf["kernel"]), (3, 2, 0, 1)))
        sd[tpfx + ".bias"] = np.asarray(leaf["bias"])
    for entry, tpfx in m["bn"]:
        leaf = _get(params, _path(entry))
        sleaf = _get(stats, _path(entry))
        sd[tpfx + ".weight"] = np.asarray(leaf["scale"])
        sd[tpfx + ".bias"] = np.asarray(leaf["bias"])
        sd[tpfx + ".running_mean"] = np.asarray(sleaf["mean"])
        sd[tpfx + ".running_var"] = np.asarray(sleaf["var"])
        sd[tpfx + ".num_batches_tracked"] = np.asarray(0, np.int64)
    for entry, tpfx in m["ln"]:
        leaf = _get(params, _path(entry))
        sd[tpfx + ".weight"] = np.asarray(leaf["scale"])
        sd[tpfx + ".bias"] = np.asarray(leaf["bias"])
    return sd
