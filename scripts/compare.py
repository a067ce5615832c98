#!/usr/bin/env python
"""Evaluate all trained pose variants on the val split and print the table.

Port of the reference's scripts/visualization/compare_all_models.py:107-181
(which, despite its "test set" docstring, evaluates the 'val' split — we
keep that behavior and expose --split for the honest alternative).

Usage:
  python scripts/compare.py --data-root .../data --mesh-dir .../models \
      --weights-root .   # expects weights_{variant}/ dirs
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def evaluate_variant(variant, variables, data_root, mesh_dir, batch_size, split,
                     img_size=None):
    import jax

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.data.pipeline import LineMODPoseLoader
    from pose6d_tpu.losses.add import ADDEvaluator
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.train.loop import TrainState, make_eval_step

    cfg = get_preset(variant, **({"img_size": img_size} if img_size else {}))
    flavor = "rgbd" if variant.startswith("rgbd") else "rgb"
    loader = LineMODPoseLoader(
        data_root, mode=split, flavor=flavor, img_size=cfg.img_size,
        augment_bbox=False, num_workers=8,
    )
    evaluator = ADDEvaluator(mesh_dir)
    model = PoseNet(PoseNetConfig(variant=variant, img_size=cfg.img_size))
    state = TrainState(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}),
        opt_state=None, step=0,
    )
    eval_step = make_eval_step(model, cfg, evaluator)

    rng = np.random.default_rng(0)
    sums = {"add_mean": 0.0, "add_s_mean": 0.0, "add_01d_acc": 0.0}
    n = 0
    for batch in loader.batches(batch_size, rng, shuffle=False, drop_remainder=False):
        m = eval_step(state, batch)
        for k in sums:
            sums[k] += float(m[k])
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--weights-root", default=".")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=None,
                    help="override the preset crop size (checkpoints are "
                         "img-size independent: fully-conv backbone)")
    ap.add_argument("--split", default="val", choices=["val", "test"])
    ap.add_argument(
        "--variants", nargs="+",
        default=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"],
    )
    ap.add_argument("--json-out", default=None,
                    help="also write per-variant metrics as JSON (consumed "
                         "by scripts/reproduce_reference.sh's parity gate)")
    args = ap.parse_args()

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.train.checkpoint import load_model_variables

    results = {}
    for variant in args.variants:
        save_dir = os.path.join(args.weights_root, f"weights_{variant}")
        variables = load_model_variables(save_dir, get_preset(variant))
        if variables is None:
            print(f"[skip] no checkpoint for {variant} in {save_dir}")
            continue
        print(f"Evaluating {variant}...")
        results[variant] = evaluate_variant(
            variant, variables, args.data_root, args.mesh_dir,
            args.batch_size, args.split, img_size=args.img_size,
        )

    if not results:
        print("No models evaluated.")
        return

    print(f"\n{'Model':<18} {'ADD (mm)':>10} {'ADD-S (mm)':>11} {'ADD-0.1d (%)':>13}")
    print("-" * 56)
    for variant, m in results.items():
        print(
            f"{variant:<18} {m['add_mean']:>10.1f} {m['add_s_mean']:>11.1f} "
            f"{m['add_01d_acc']:>13.2f}"
        )
    best = max(results, key=lambda v: results[v]["add_01d_acc"])
    print(f"\nBest model: {best} (ADD-0.1d: {results[best]['add_01d_acc']:.2f}%)")

    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
