#!/usr/bin/env python
"""Gradient-flow probe for the rgbd fusion learning stall (VERDICT r2 #2).

The rgbd variant is the worst fixture learner (4.46% val ADD-0.1d) while
rgbd_geometric saturates with a wide rotation head. The rgbd architecture
differs in its FUSION STACK: LayerNorm'd tower features -> cross-head
attention residual -> concat -> 4096->1024->1024 GELU/LayerNorm bottleneck
-> GELU heads (reference models/pose_net_rgbd.py:73-103).

This probe measures, per module group, the gradient norm of the ROTATION
loss component at init and after a few steps, across fusion configurations:

  rgb               — baseline (feature -> wide BN/ReLU heads)
  rgbd              — reference fusion (attention + bottleneck + GELU heads)
  rgbd_noattn       — no attention residual (concat fusion only)
  rgbd_widehead     — reference fusion, wide BN/ReLU rotation head

If the per-parameter gradient RMS entering the backbones is orders smaller
for the rgbd configs, the bottleneck/attention attenuates rotation signal
(architecture-bound, matching the reference); if norms are comparable, the
stall is optimization dynamics (LR/schedule) instead.

CPU-safe (tiny images, small batch): run anytime, no chip needed.
"""

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def group_of(path: str) -> str:
    top = path.split("/")[0]
    if top.startswith("rgb_backbone") or top == "backbone":
        return "rgb_backbone"
    if top.startswith("depth_backbone"):
        return "depth_backbone"
    if top.startswith("cross_attention"):
        return "attention"
    if top.startswith("fusion") or top in ("rgb_norm", "depth_norm"):
        return "fusion"
    if top.startswith("rot_"):
        return "rot_head"
    if top.startswith("trans_") or top.startswith("z_"):
        return "trans_head"
    return "other"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flax.traverse_util import flatten_dict

    from pose6d_tpu.losses.pose_loss import PoseLossConfig, pose_loss
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig

    S = int(os.environ.get("PROBE_IMG", "64"))
    B = int(os.environ.get("PROBE_BATCH", "16"))
    STEPS = int(os.environ.get("PROBE_STEPS", "10"))

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(-2, 2, (B, S, S, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0, 1, (B, S, S, 1)), jnp.float32)
    # random unit quats + translations, fixed across configs
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    quat = jnp.asarray(q, jnp.float32)
    trans = jnp.asarray(rng.normal(0, 0.1, (B, 3)) + [0, 0, 0.8], jnp.float32)

    configs = {
        "rgb": PoseNetConfig(variant="rgb", img_size=S),
        "rgbd": PoseNetConfig(variant="rgbd", img_size=S),
        "rgbd_noattn": PoseNetConfig(variant="rgbd", img_size=S,
                                     fusion_attention=False),
        "rgbd_widehead": PoseNetConfig(variant="rgbd", img_size=S,
                                       rot_head_wide=True),
    }
    # rotation-only loss: isolates the rotation pathway's gradient signal
    loss_cfg = PoseLossConfig(trans_weight=0.0)

    report = {}
    for name, cfg in configs.items():
        model = PoseNet(cfg)
        kwargs = {"rgb": rgb}
        if cfg.variant == "rgbd":
            kwargs["depth"] = depth
        variables = model.init(jax.random.key(0), **{k: v[:1] for k, v in kwargs.items()})
        params, batch_stats = variables["params"], variables.get("batch_stats", {})

        def loss_fn(p, bs):
            out, updates = model.apply(
                {"params": p, "batch_stats": bs}, train=True,
                rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
                **kwargs,
            )
            rot, tr = out
            return (pose_loss(rot, tr, quat, trans, loss_cfg),
                    updates.get("batch_stats", bs))

        tx = optax.adamw(5e-4, weight_decay=1e-4)
        opt_state = tx.init(params)

        @jax.jit
        def step(p, bs, os_):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bs)
            upd, new_os = tx.update(grads, os_, p)
            return optax.apply_updates(p, upd), new_bs, new_os, grads, loss

        def grad_rms_by_group(grads):
            sq, n = defaultdict(float), defaultdict(int)
            for path, g in flatten_dict(grads, sep="/").items():
                grp = group_of(path)
                sq[grp] += float(jnp.sum(g.astype(jnp.float64) ** 2))
                n[grp] += int(np.prod(g.shape))
            return {k: float(np.sqrt(sq[k] / max(n[k], 1))) for k in sq}

        snaps = {}
        loss0 = None
        for i in range(STEPS):
            params, batch_stats, opt_state, grads, loss = step(
                params, batch_stats, opt_state)
            if i == 0:
                snaps["init"] = grad_rms_by_group(grads)
                loss0 = float(loss)
        snaps["final"] = grad_rms_by_group(grads)
        report[name] = {
            "loss_first": round(loss0, 4),
            "loss_last": round(float(loss), 4),
            "grad_rms": {k: {g: float(f"{v:.3e}") for g, v in d.items()}
                         for k, d in snaps.items()},
        }
        print(f"== {name}: loss {loss0:.4f} -> {float(loss):.4f}", file=sys.stderr)
        for phase, d in snaps.items():
            for g, v in sorted(d.items()):
                print(f"   {phase:<6} {g:<16} {v:.3e}", file=sys.stderr)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
