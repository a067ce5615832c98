"""torchvision ResNet50 -> Flax parameter conversion.

The reference's published accuracies depend on ImageNet-pretrained
torchvision ResNet50 initialization (reference: models/pose_net_rgb.py:18-19)
and a depth branch whose conv1 is the pretrained RGB conv1 summed over input
channels (models/pose_net_rgbd.py:53-59). This module maps a torchvision
`state_dict` (loaded from a user-provided .pth file; no network access is
assumed) onto the `pose6d_tpu.models.resnet.ResNet` parameter tree,
including BatchNorm running statistics.

Layout conversions:
  conv weight:  torch [O, I, kh, kw] -> flax [kh, kw, I, O]
  linear weight: torch [O, I]        -> flax [I, O]
  bn: weight->scale, bias->bias, running_mean/var -> batch_stats
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _to_np(t):
    # torch tensor or ndarray -> float32 ndarray without importing torch here
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_w(t):
    return np.transpose(_to_np(t), (2, 3, 1, 0))


_STAGE_SIZES = (3, 4, 6, 3)


def torchvision_resnet50_to_flax(
    state_dict: Mapping[str, "np.ndarray"],
    sum_conv1_to_1ch: bool = False,
    prefix: str = "",
) -> tuple[dict, dict]:
    """Convert a torchvision resnet50 state_dict to (params, batch_stats).

    Args:
      state_dict: torchvision-style mapping (torch tensors or ndarrays).
        Keys may carry a prefix (e.g. 'backbone.0.' from the reference's
        nn.Sequential wrapping); pass it via `prefix`.
      sum_conv1_to_1ch: reproduce the depth-branch init — conv1 weights
        summed over the 3 input channels to a single channel.

    Returns:
      (params, batch_stats) dicts matching `ResNet50().init(...)` structure.
    """

    def g(key):
        return state_dict[prefix + key]

    params: dict = {}
    stats: dict = {}

    conv1 = _conv_w(g("conv1.weight"))
    if sum_conv1_to_1ch:
        conv1 = conv1.sum(axis=2, keepdims=True)
    params["conv1"] = {"kernel": conv1}
    params["bn1"] = {"scale": _to_np(g("bn1.weight")), "bias": _to_np(g("bn1.bias"))}
    stats["bn1"] = {
        "mean": _to_np(g("bn1.running_mean")),
        "var": _to_np(g("bn1.running_var")),
    }

    for stage_idx, n_blocks in enumerate(_STAGE_SIZES):
        for block_idx in range(n_blocks):
            tprefix = f"layer{stage_idx + 1}.{block_idx}."
            fname = f"layer{stage_idx + 1}_{block_idx}"
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv_w(g(tprefix + f"conv{ci}.weight"))}
                bp[f"bn{ci}"] = {
                    "scale": _to_np(g(tprefix + f"bn{ci}.weight")),
                    "bias": _to_np(g(tprefix + f"bn{ci}.bias")),
                }
                bs[f"bn{ci}"] = {
                    "mean": _to_np(g(tprefix + f"bn{ci}.running_mean")),
                    "var": _to_np(g(tprefix + f"bn{ci}.running_var")),
                }
            if (prefix + tprefix + "downsample.0.weight") in state_dict:
                bp["downsample_conv"] = {
                    "kernel": _conv_w(g(tprefix + "downsample.0.weight"))
                }
                bp["downsample_bn"] = {
                    "scale": _to_np(g(tprefix + "downsample.1.weight")),
                    "bias": _to_np(g(tprefix + "downsample.1.bias")),
                }
                bs["downsample_bn"] = {
                    "mean": _to_np(g(tprefix + "downsample.1.running_mean")),
                    "var": _to_np(g(tprefix + "downsample.1.running_var")),
                }
            params[fname] = bp
            stats[fname] = bs

    return params, stats


def s2d_conv1_weights(w7: np.ndarray) -> np.ndarray:
    """Transform a [7, 7, C, O] stem kernel into the exactly-equivalent
    [4, 4, 4C, O] kernel for the space-to-depth stem (resnet.py).

    Derivation: pad the 7x7 kernel to 8x8 with a zero row/col at the
    top-left (turning pad 3/3 into 4/3), then fold each 2x2 tap block into
    the channel dim: w2[m, n, (dy, dx, c)] = w8[2m + dy, 2n + dx, c]. The
    4x4/s1 conv on 2x2-block-to-channel input with pad (2,1) reproduces the
    7x7/s2 conv output exactly (unit-tested)."""
    kh, kw, C, O = w7.shape
    assert (kh, kw) == (7, 7)
    w8 = np.zeros((8, 8, C, O), w7.dtype)
    w8[1:, 1:] = w7
    w2 = w8.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return np.ascontiguousarray(w2.reshape(4, 4, 4 * C, O))


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth state_dict via torch (CPU). Accepts either a bare
    state_dict or a checkpoint dict containing 'state_dict' / 'model'."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return obj
