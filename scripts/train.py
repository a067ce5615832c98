#!/usr/bin/env python
"""Train a pose-estimation variant on LineMOD.

Replaces the reference's four per-variant training scripts
(scripts/training/train_{rgb,rgb_geometric,rgbd,rgbd_geometric}.py) with one
CLI; the recipe constants live in pose6d_tpu.configs.presets.

Usage:
  python scripts/train.py --variant rgb --data-root datasets/Linemod_preprocessed/data \
      --mesh-dir datasets/Linemod_preprocessed/models --save-dir weights_rgb
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", required=True,
                    choices=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"])
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--profile-dir", default=None,
                    help="emit a jax.profiler trace for the second epoch")
    ap.add_argument("--pretrained-backbone", default=None,
                    help="path to a torchvision resnet50 state_dict (.pth) "
                         "for ImageNet backbone init")
    ap.add_argument("--mesh", default=None, metavar="DP,TP",
                    help="device mesh shape, e.g. '4,2' = 4-way data x 2-way "
                         "tensor parallel over jax.devices(); default single-device")
    args = ap.parse_args()

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.train import Trainer

    mesh = None
    if args.mesh is not None:
        from pose6d_tpu.parallel import make_mesh

        dp, tp = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh((dp, tp))
        print(f"Device mesh: {dict(mesh.shape)}")

    overrides = {}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.img_size is not None:
        overrides["img_size"] = args.img_size
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    cfg = get_preset(args.variant, **overrides)

    save_dir = args.save_dir or f"weights_{args.variant}"
    print(f"Training {args.variant} -> {save_dir}")
    trainer = Trainer(
        cfg, args.data_root, args.mesh_dir, save_dir,
        seed=args.seed, num_workers=args.num_workers, profile_dir=args.profile_dir,
        pretrained_backbone=args.pretrained_backbone, mesh=mesh,
    )
    print(f"Train: {len(trainer.train_loader)}, Val: {len(trainer.val_loader)} samples")
    trainer.fit()


if __name__ == "__main__":
    main()
