"""ultralytics YOLOv8 state_dict -> Flax parameter conversion.

The reference starts detector training from the pretrained yolov8n.pt
(scripts/training/train_yolo.py:41). This maps an ultralytics-style
state_dict (torch tensors or ndarrays; keys like "model.model.0.conv.weight"
or without the leading "model.") onto our YoloV8 parameter tree, including
BatchNorm running stats.

ultralytics module indices for the v8 layout:
  backbone: 0 stem, 1 down1, 2 c2f_1, 3 down2, 4 c2f_2, 5 down3, 6 c2f_3,
            7 down4, 8 c2f_4, 9 sppf
  neck:     12 td_p4, 15 td_p3, 16 bu_down3, 18 bu_p4, 19 bu_down4, 21 bu_p5
            (10/13 upsample, 11/14/17/20 concat carry no weights)
  head:     22 Detect — cv2[i] = box branch (Conv, Conv, Conv2d),
            cv3[i] = cls branch; the DFL conv is a fixed arange, not loaded.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import numpy as np


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_w(t):
    # torch [O, I, kh, kw] -> flax [kh, kw, I, O]
    return np.transpose(_to_np(t), (2, 3, 1, 0))


class _SD:
    def __init__(self, state_dict: Mapping):
        self.sd = state_dict
        self.prefix = "model.model." if any(
            k.startswith("model.model.") for k in state_dict
        ) else "model." if any(k.startswith("model.") for k in state_dict) else ""

    def __getitem__(self, key):
        return self.sd[self.prefix + key]

    def __contains__(self, key):
        return (self.prefix + key) in self.sd


def _convbn(sd: _SD, tkey: str) -> Tuple[dict, dict]:
    params = {
        "conv": {"kernel": _conv_w(sd[f"{tkey}.conv.weight"])},
        "bn": {
            "scale": _to_np(sd[f"{tkey}.bn.weight"]),
            "bias": _to_np(sd[f"{tkey}.bn.bias"]),
        },
    }
    stats = {
        "bn": {
            "mean": _to_np(sd[f"{tkey}.bn.running_mean"]),
            "var": _to_np(sd[f"{tkey}.bn.running_var"]),
        }
    }
    return params, stats


def _c2f(sd: _SD, tkey: str, n: int) -> Tuple[dict, dict]:
    params, stats = {}, {}
    for ours, theirs in (("cv1", "cv1"), ("cv2", "cv2")):
        p, s = _convbn(sd, f"{tkey}.{theirs}")
        params[ours], stats[ours] = p, s
    for i in range(n):
        bp, bs = {}, {}
        for cv in ("cv1", "cv2"):
            p, s = _convbn(sd, f"{tkey}.m.{i}.{cv}")
            bp[cv], bs[cv] = p, s
        params[f"m{i}"], stats[f"m{i}"] = bp, bs
    return params, stats


def ultralytics_yolov8_to_flax(state_dict: Mapping, cfg) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) matching YoloV8(cfg).init structure."""
    sd = _SD(state_dict)
    d = cfg.depth_n

    params = {"backbone": {}, "neck": {}, "head": {}}
    stats = {"backbone": {}, "neck": {}, "head": {}}

    backbone_map = [
        ("stem", "0", None), ("down1", "1", None), ("c2f_1", "2", d(3)),
        ("down2", "3", None), ("c2f_2", "4", d(6)), ("down3", "5", None),
        ("c2f_3", "6", d(6)), ("down4", "7", None), ("c2f_4", "8", d(3)),
    ]
    for ours, idx, n in backbone_map:
        p, s = _convbn(sd, idx) if n is None else _c2f(sd, idx, n)
        params["backbone"][ours], stats["backbone"][ours] = p, s
    # SPPF
    sp, ss = {}, {}
    for cv in ("cv1", "cv2"):
        p, s = _convbn(sd, f"9.{cv}")
        sp[cv], ss[cv] = p, s
    params["backbone"]["sppf"], stats["backbone"]["sppf"] = sp, ss

    neck_map = [
        ("td_p4", "12", d(3)), ("td_p3", "15", d(3)), ("bu_down3", "16", None),
        ("bu_p4", "18", d(3)), ("bu_down4", "19", None), ("bu_p5", "21", d(3)),
    ]
    for ours, idx, n in neck_map:
        p, s = _convbn(sd, idx) if n is None else _c2f(sd, idx, n)
        params["neck"][ours], stats["neck"][ours] = p, s

    for i in range(3):
        for branch, ours_prefix in (("cv2", "box"), ("cv3", "cls")):
            for j in (0, 1):
                p, s = _convbn(sd, f"22.{branch}.{i}.{j}")
                params["head"][f"{ours_prefix}{i}_{j}"] = p
                stats["head"][f"{ours_prefix}{i}_{j}"] = s
            params["head"][f"{ours_prefix}{i}_out"] = {
                "kernel": _conv_w(sd[f"22.{branch}.{i}.2.weight"]),
                "bias": _to_np(sd[f"22.{branch}.{i}.2.bias"]),
            }

    return params, stats


def flax_to_ultralytics_keys(params: dict, stats: dict, cfg) -> dict:
    """Inverse mapping (flax tree -> ultralytics-style flat dict). Used by the
    round-trip test and for exporting weights to ultralytics consumers."""
    out = {}

    def put_convbn(tkey, p, s):
        out[f"{tkey}.conv.weight"] = np.transpose(p["conv"]["kernel"], (3, 2, 0, 1))
        out[f"{tkey}.bn.weight"] = p["bn"]["scale"]
        out[f"{tkey}.bn.bias"] = p["bn"]["bias"]
        out[f"{tkey}.bn.running_mean"] = s["bn"]["mean"]
        out[f"{tkey}.bn.running_var"] = s["bn"]["var"]

    def put_c2f(tkey, p, s):
        put_convbn(f"{tkey}.cv1", p["cv1"], s["cv1"])
        put_convbn(f"{tkey}.cv2", p["cv2"], s["cv2"])
        i = 0
        while f"m{i}" in p:
            put_convbn(f"{tkey}.m.{i}.cv1", p[f"m{i}"]["cv1"], s[f"m{i}"]["cv1"])
            put_convbn(f"{tkey}.m.{i}.cv2", p[f"m{i}"]["cv2"], s[f"m{i}"]["cv2"])
            i += 1

    bmap = [("stem", "0"), ("down1", "1"), ("c2f_1", "2"), ("down2", "3"),
            ("c2f_2", "4"), ("down3", "5"), ("c2f_3", "6"), ("down4", "7"),
            ("c2f_4", "8")]
    for ours, idx in bmap:
        p, s = params["backbone"][ours], stats["backbone"][ours]
        (put_c2f if ours.startswith("c2f") else put_convbn)(idx, p, s)
    put_convbn("9.cv1", params["backbone"]["sppf"]["cv1"], stats["backbone"]["sppf"]["cv1"])
    put_convbn("9.cv2", params["backbone"]["sppf"]["cv2"], stats["backbone"]["sppf"]["cv2"])

    nmap = [("td_p4", "12"), ("td_p3", "15"), ("bu_down3", "16"),
            ("bu_p4", "18"), ("bu_down4", "19"), ("bu_p5", "21")]
    for ours, idx in nmap:
        p, s = params["neck"][ours], stats["neck"][ours]
        (put_c2f if not ours.startswith("bu_down") else put_convbn)(idx, p, s)

    for i in range(3):
        for branch, ours_prefix in (("cv2", "box"), ("cv3", "cls")):
            for j in (0, 1):
                put_convbn(
                    f"22.{branch}.{i}.{j}",
                    params["head"][f"{ours_prefix}{i}_{j}"],
                    stats["head"][f"{ours_prefix}{i}_{j}"],
                )
            out[f"22.{branch}.{i}.2.weight"] = np.transpose(
                params["head"][f"{ours_prefix}{i}_out"]["kernel"], (3, 2, 0, 1)
            )
            out[f"22.{branch}.{i}.2.bias"] = params["head"][f"{ours_prefix}{i}_out"]["bias"]

    return out
