#!/usr/bin/env python
"""Migrate trained pose checkpoints between the reference and this framework.

The reference publishes trained weights as `weights_<variant>/
best_pose_model.pth` with the model under 'model_state_dict'
(scripts/training/train_rgb.py:146-161, compare_all_models.py:26-29,56).
Forward parity of the mapping is golden-tested against the reference's own
model classes (tests/test_posenet_torch_golden.py), so a converted
checkpoint reproduces the reference model's exact function.

Import (reference .pth -> orbax dir usable by compare.py/infer.py/eval_e2e.py):
  python scripts/convert_reference_weights.py to-tpu \
      --variant rgb --pth weights_rgb/best_pose_model.pth --dest weights_rgb_tpu

Export (our orbax checkpoint -> reference-loadable .pth):
  python scripts/convert_reference_weights.py to-torch \
      --variant rgb --weights weights_rgb_tpu --out best_pose_model.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def cmd_to_tpu(args):
    import jax

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.models.convert import load_torch_state_dict
    from pose6d_tpu.models.convert_posenet import posenet_torch_to_flax
    from pose6d_tpu.train.checkpoint import CheckpointManager
    from pose6d_tpu.train.loop import create_train_state
    from pose6d_tpu.train.schedule import ReduceLROnPlateau

    sd = load_torch_state_dict(args.pth)
    variables = posenet_torch_to_flax(args.variant, sd)

    cfg = get_preset(args.variant)
    _, _, state = create_train_state(cfg, jax.random.key(0))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])

    sched = ReduceLROnPlateau(lr=cfg.learning_rate, factor=cfg.plateau_factor,
                              patience=cfg.plateau_patience, min_lr=cfg.min_lr)
    CheckpointManager(args.dest).save(
        state, epoch=0, best_acc=0.0, curr_acc=0.0, curr_add=0.0,
        scheduler_state=sched.state_dict(), is_best=True,
    )
    print(f"imported {args.pth} [{args.variant}] -> {args.dest}/{{best,last}}")


def cmd_to_torch(args):
    import numpy as np
    import torch

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.models.convert_posenet import posenet_flax_to_torch
    from pose6d_tpu.train.checkpoint import load_model_variables

    variables = load_model_variables(args.weights, get_preset(args.variant),
                                     name=args.ckpt)
    if variables is None:
        raise SystemExit(f"no checkpoint under {args.weights}")
    sd = posenet_flax_to_torch(args.variant, variables)
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()}},
        args.out,
    )
    print(f"exported {args.weights} [{args.variant}] -> {args.out}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("to-tpu", help="reference .pth -> orbax checkpoint dir")
    p1.add_argument("--variant", required=True,
                    choices=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"])
    p1.add_argument("--pth", required=True)
    p1.add_argument("--dest", required=True)
    p1.set_defaults(fn=cmd_to_tpu)

    p2 = sub.add_parser("to-torch", help="orbax checkpoint dir -> reference .pth")
    p2.add_argument("--variant", required=True,
                    choices=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"])
    p2.add_argument("--weights", required=True)
    p2.add_argument("--out", required=True)
    p2.add_argument("--ckpt", default="best", choices=["best", "last"])
    p2.set_defaults(fn=cmd_to_torch)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
