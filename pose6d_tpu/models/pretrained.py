"""Pretrained initialization for the pose networks.

The reference's published accuracies depend on ImageNet-pretrained ResNet50
backbones (pose_net_rgb.py:18-19) and the depth branch's summed-conv1 init
(pose_net_rgbd.py:53-59). Given a torchvision resnet50 state_dict (a .pth
the user provides — this environment has no network), this initializes a
PoseNet with converted backbone weights while heads keep their fresh init.
"""

from __future__ import annotations

from typing import Optional

import jax
import flax

from .convert import load_torch_state_dict, s2d_conv1_weights, torchvision_resnet50_to_flax
from .posenet import PoseNet, PoseNetConfig

# variant -> (backbone module names, which of them take the 1-ch depth init)
_BACKBONES = {
    "rgb": (("backbone",), ()),
    "rgb_geometric": (("backbone",), ()),
    "rgbd": (("rgb_backbone", "depth_backbone"), ("depth_backbone",)),
    "rgbd_geometric": (("backbone",), ()),
}


def init_posenet_with_pretrained(
    cfg: PoseNetConfig,
    rng: jax.Array,
    resnet_state_dict,
    example_inputs: Optional[dict] = None,
) -> dict:
    """Initialize PoseNet variables with pretrained backbone weights.

    `resnet_state_dict` is a torchvision resnet50 state_dict (mapping) or a
    path to a .pth file. Returns the full variables dict.
    """
    import jax.numpy as jnp

    if isinstance(resnet_state_dict, str):
        resnet_state_dict = load_torch_state_dict(resnet_state_dict)

    model = PoseNet(cfg)
    S = cfg.img_size
    inputs = example_inputs or {}
    kwargs = {"rgb": jnp.zeros((1, S, S, 3))}
    if cfg.variant == "rgbd":
        kwargs["depth"] = jnp.zeros((1, S, S, 1))
    if cfg.variant in ("rgb_geometric", "rgbd_geometric"):
        kwargs["bbox_center"] = jnp.zeros((1, 2))
        kwargs["camera_matrix"] = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    if cfg.variant == "rgbd_geometric":
        kwargs["depth_raw"] = jnp.zeros((1, S, S))
    kwargs.update(inputs)

    variables = model.init(rng, **kwargs)
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    names, depth_names = _BACKBONES[cfg.variant]
    for name in names:
        p, s = torchvision_resnet50_to_flax(
            resnet_state_dict, sum_conv1_to_1ch=(name in depth_names)
        )
        if cfg.stem_s2d:
            # The s2d stem expects an exactly-equivalent [4,4,4C,O] kernel;
            # fold after the depth-branch channel sum so C is final.
            p["conv1"]["kernel"] = s2d_conv1_weights(p["conv1"]["kernel"])
        params[name] = jax.tree.map(jnp.asarray, p)
        stats[name] = jax.tree.map(jnp.asarray, s)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
