#!/usr/bin/env python
"""Accuracy-parity evidence run: train all four pose variants to saturation.

No network access means no real LineMOD, so the parity claim is demonstrated
on the synthetic fixture (pose6d_tpu/data/synthetic.py): every variant —
including the learned-rotation ones — must drive val ADD-0.1d far above
chance under the reference's exact 75-epoch recipe (configs/presets.py),
with the metrics.csv curves as the evidence trail. Reference targets for
real data remain /root/reference/README.md:28-33.

Usage (full run, real chip):
  python scripts/parity_run.py --workdir /tmp/pose6d_parity
Incremental (one variant at a time; runs resume):
  python scripts/parity_run.py --workdir /tmp/pose6d_parity --variants rgb
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def summarize_variant(save_dir: str, best: float) -> dict:
    """Condense a variant's metrics.csv into the results entry: best
    ADD-0.1d plus first/best-epoch markers and the final ADD/loss values."""
    import csv

    rows = []
    with open(os.path.join(save_dir, "metrics.csv")) as f:
        for row in csv.DictReader(f):
            rows.append({k: float(v) for k, v in row.items()})
    # a resume after a clipped run re-logs its restart window (the pre-kill
    # rows 66..clip belong to an abandoned branch): keep the LAST occurrence
    # of each epoch so epochs_run and the final/best markers describe the
    # trajectory that actually produced the checkpoints
    rows = list({int(r["epoch"]): r for r in rows}.values())
    rows.sort(key=lambda r: r["epoch"])
    best_row = max(rows, key=lambda r: r["val_acc"])
    first_hit = next((r for r in rows if r["val_acc"] >= 0.5 * best), None)
    return {
        "best_add01d": best,
        # metrics.csv stores 0-based epochs; report 1-based to match the
        # console log's "Epoch {epoch+1}" lines
        "best_epoch": int(best_row["epoch"]) + 1,
        "epochs_run": len(rows),
        "val_add_mm_at_best": best_row["val_add"],
        "val_add_s_mm_at_best": best_row["val_add_s"],
        "final_train_loss": rows[-1]["train_loss"],
        "epoch_half_best": int(first_hit["epoch"]) + 1 if first_hit else None,
    }


def write_markdown(args, results: dict, path: str | None = None) -> None:
    """Base table of PARITY_RESULTS.md. Writes its SECTION file and
    reassembles the document (parity_md) so re-running never clobbers the
    other producers' sections; `path` writes the section directly (tests)."""
    lines = [
        "# Accuracy-parity evidence (synthetic fixture, real TPU chip)\n\n",
        "All four pose variants trained to saturation by `scripts/parity_run.py` "
        f"({args.objects} objects x {args.frames} frames, rotations in a "
        f"{args.max_angle_deg:.0f}-degree geodesic ball, lr {args.lr}, plateau "
        f"patience {args.patience}, batch {args.batch_size}, early stop at "
        f"{args.early_stop_acc}% val ADD-0.1d; recipe deviations from the "
        "reference's pretrained-backbone/real-data defaults are documented in "
        "the script). Per-epoch curves: `parity/weights_<variant>/metrics.csv`.\n\n",
        "Chance-level ADD-0.1d on this fixture is ~0%; the reference's real-"
        "LineMOD numbers (13.35/23.20/21.20/27.45%, /root/reference/README.md:28-33) "
        "remain the targets for when real data is available.\n\n",
        "| variant | best val ADD-0.1d % | best epoch | epochs run | "
        "ADD mm @ best | ADD-S mm @ best | final train loss |\n",
        "|---|---|---|---|---|---|---|\n",
    ]
    for v, r in results.items():
        lines.append(
            f"| {v} | {r['best_add01d']:.2f} | {r['best_epoch']} | {r['epochs_run']} "
            f"| {r['val_add_mm_at_best']:.1f} | {r['val_add_s_mm_at_best']:.1f} "
            f"| {r['final_train_loss']:.4f} |\n"
        )
    if path is not None:
        with open(path, "w") as f:
            f.writelines(lines)
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_md import write_section

    write_section(args.workdir, "base", "".join(lines))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/pose6d_parity")
    ap.add_argument("--objects", type=int, default=6)
    ap.add_argument("--frames", type=int, default=700)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--early-stop-acc", type=float, default=97.0)
    # From-scratch-on-synthetic deviations from the reference recipe (which
    # assumes an ImageNet-pretrained backbone + real data):
    #   - higher base LR + longer plateau patience: val ADD-0.1d sits at 0
    #     early, and patience-5 halves the LR into the ground before the
    #     from-scratch rotation pathway converges
    #   - more frames/object: SO(3) regression from scratch needs denser
    #     rotation coverage than 300 views
    #   - RandomGrayscale disabled (rgb variant): the synthetic fixture
    #     encodes orientation in fixed marker COLORS, so grayscaling removes
    #     the label information itself (on real data texture survives; the
    #     full-recipe grayscale path stays covered by tests)
    #   - bounded rotation range (default 75 deg): real LineMOD poses span a
    #     bounded viewing range; uniform-SO(3) sampling puts the quaternion
    #     double-cover seam inside the data, which no continuous regressor
    #     (the reference architecture included) can cross
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--patience", type=int, default=15)
    ap.add_argument("--max-angle-deg", type=float, default=75.0)
    ap.add_argument(
        "--variants", nargs="+",
        default=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"],
    )
    ap.add_argument("--seed", type=int, default=0)
    # ablation: rgb-style 2048/1024/512 rotation head for the geometric
    # variants (see PARITY_RESULTS.md "Reading the tables"); results and
    # weights are suffixed so the reference-faithful runs are untouched
    ap.add_argument("--rot-head-wide", action="store_true")
    # add symmetric objects (folders 10/11, rendered with 180-deg-symmetric
    # marker colors) to the fixture — ADD-S system-level evidence
    ap.add_argument("--symmetric-objects", action="store_true")
    # ablation (rgbd): bypass CrossModalAttention, plain concat fusion —
    # the gradient-flow probe for the rgbd learning stall (weights saved
    # under weights_rgbd_noattn)
    ap.add_argument("--no-fusion-attention", dest="fusion_attention",
                    action="store_false", default=True)
    # rgbd training fix probe: attention ACTIVE but out_proj zero-init, so
    # optimization starts from the concat-fusion landscape the no-attention
    # ablation showed to be well-conditioned (weights_rgbd_zeroattn)
    ap.add_argument("--attn-zero-init", action="store_true")
    # rgb_geometric z-pathway diagnosis arms (VERDICT round-4 #5; see
    # PoseNetConfig docstring): z head off the ResNet50 features
    # (weights_*_zbb) / double-width separate Z-CNN (weights_*_zwide)
    ap.add_argument("--z-from-backbone", action="store_true")
    ap.add_argument("--z-backbone-wide", action="store_true")
    # round-3 default: decode the train split once into HBM and crop on the
    # MXU inside the train step (train/loop.expand_device_batch) — removes
    # the ~1% MFU host wall measured in round 2 (PERF.md). Validation keeps
    # the host cv2 path, so val metrics stay comparable across rounds.
    ap.add_argument(
        "--init-towers-from", default=None,
        help="Trainer save_dir of a trained donor run; its tower scopes "
             "(params+batch_stats) are grafted into the fresh init — the "
             "fixture-native analogue of the reference's ImageNet warm "
             "start (train/warmstart.py). Run name gets a _warmstart suffix.")
    ap.add_argument(
        "--donor-variant", default=None,
        help="donor run's variant, with parity_run suffixes (e.g. "
             "rgbd_noattn); defaults to the trained variant itself")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training (bf16 compute, f32 "
                         "params/loss; val always f32) — TPU throughput A/B")
    ap.add_argument("--no-device-preprocess", dest="device_preprocess",
                    action="store_false", default=True)
    args = ap.parse_args()

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.data.synthetic import generate_synthetic_linemod
    from pose6d_tpu.ops.augment import AugmentConfig
    from pose6d_tpu.train.trainer import Trainer

    os.makedirs(args.workdir, exist_ok=True)
    data_root = os.path.join(args.workdir, "synth", "data")
    mesh_dir = os.path.join(args.workdir, "synth", "models")
    # regular objects in folders 1..N, plus (opt-in) SYMMETRIC objects in
    # folders 10/11 — LineMOD's eggbox/glue slots, 0-indexed ids 9/10 — so
    # the trained-system evidence exercises the ADD-S-for-symmetric path.
    # Opt-in (use a FRESH --workdir for it) so the committed 6-object
    # evidence tree keeps its exact composition; folders are generated
    # incrementally and models_info.yml merges.
    want = list(range(1, args.objects + 1)) + (
        [10, 11] if args.symmetric_objects else []
    )
    missing = [o for o in want
               if not os.path.isdir(os.path.join(data_root, f"{o:02d}"))]
    if missing:
        print(f"[parity] generating synthetic objects {missing} "
              f"x {args.frames} frames")
        generate_synthetic_linemod(
            os.path.join(args.workdir, "synth"),
            obj_ids=tuple(missing),
            frames_per_obj=args.frames, seed=args.seed,
            max_angle_deg=args.max_angle_deg,
        )

    results_path = os.path.join(args.workdir, "results.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
    for variant in args.variants:
        name = (variant + ("_widehead" if args.rot_head_wide else "")
                + ("" if args.fusion_attention else "_noattn")
                + ("_zeroattn" if args.attn_zero_init else "")
                + ("_zbb" if args.z_from_backbone else "")
                + ("_zwide" if args.z_backbone_wide else "")
                + ("_bf16" if args.bf16 else "")
                + ("_warmstart" if args.init_towers_from else ""))
        save_dir = os.path.join(args.workdir, f"weights_{name}")
        cfg = get_preset(variant, epochs=args.epochs, batch_size=args.batch_size,
                         learning_rate=args.lr, plateau_patience=args.patience,
                         augment=AugmentConfig(grayscale_p=0.0),
                         rot_head_wide=args.rot_head_wide,
                         fusion_attention=args.fusion_attention,
                         attn_zero_init=args.attn_zero_init,
                         z_from_backbone=args.z_from_backbone,
                         z_backbone_wide=args.z_backbone_wide,
                         compute_dtype="bfloat16" if args.bf16 else "float32")
        print(f"\n=== {variant}: training to {args.epochs} epochs "
              f"(early stop at {args.early_stop_acc}% ADD-0.1d) ===")
        trainer = Trainer(
            cfg, data_root, mesh_dir, save_dir,
            seed=args.seed, num_workers=args.num_workers,
            cache_decoded=True,  # ~4 GB RAM; PNG decode dominates host time
            device_preprocess=args.device_preprocess,
        )
        if args.init_towers_from and (trainer.ckpt.has_checkpoint()
                                      or trainer.ckpt.has_checkpoint("best")):
            # fit() will try_resume() from save_dir, overwriting any graft we
            # apply now — the warm start already happened in the run that
            # created that checkpoint. Grafting again (and claiming so in the
            # log) would misstate what this process's init actually was.
            print(f"[parity] {save_dir} already has a checkpoint; resuming "
                  "it — tower graft skipped (already applied at run start)")
        elif args.init_towers_from:
            from pose6d_tpu.train.checkpoint import load_model_variables
            from pose6d_tpu.train.warmstart import graft_towers

            dname = args.donor_variant or variant
            dbase = dname
            for suf in ("_noattn", "_widehead", "_zeroattn", "_zbb",
                        "_zwide", "_bf16"):
                dbase = dbase.replace(suf, "")
            donor_cfg = get_preset(
                dbase, batch_size=args.batch_size,
                rot_head_wide="_widehead" in dname,
                fusion_attention="_noattn" not in dname,
                attn_zero_init="_zeroattn" in dname,
                z_from_backbone="_zbb" in dname,
                z_backbone_wide="_zwide" in dname,
                compute_dtype="bfloat16" if "_bf16" in dname else "float32")
            donor = load_model_variables(args.init_towers_from, donor_cfg)
            if donor is None:
                raise SystemExit(
                    f"--init-towers-from: no checkpoint in {args.init_towers_from}")
            new_vars, grafted = graft_towers(
                {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}, donor)
            trainer.state = trainer.state.replace(
                params=new_vars["params"], batch_stats=new_vars["batch_stats"])
            print(f"[parity] warm-started towers: {grafted} "
                  f"from {args.init_towers_from}")
        best = trainer.fit(epochs=args.epochs, early_stop_acc=args.early_stop_acc)
        results[name] = summarize_variant(save_dir, best)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)
        write_markdown(args, results)

    print("\n=== summary (val ADD-0.1d %, synthetic fixture) ===")
    for variant, r in results.items():
        print(f"  {variant:<18} {r['best_add01d']:.2f}")
    print(f"\nresults.json + per-variant metrics.csv under {args.workdir}")
    print("Reproduce the table with:")
    print(f"  python scripts/compare.py --data-root {data_root} "
          f"--mesh-dir {mesh_dir} --weights-root {args.workdir}")


if __name__ == "__main__":
    main()
