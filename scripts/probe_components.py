#!/usr/bin/env python
"""Per-component error probe for trained parity checkpoints.

Decomposes each variant's val error into rotation (geodesic, degrees) and
translation (|xy|, |z|, mm) so the ADD-0.1d numbers in PARITY_RESULTS.md can
be attributed: the rgb variant regresses x/y from a recentred crop that
carries no crop-location information, so its xy error is architecture-bound
(the same bound that caps the reference's own PoseNetRGB at 13.35% ADD-0.1d
on real LineMOD, /root/reference/README.md:28-33), while its rotation
pathway — the part the trainer actually has to learn — converges to a few
degrees. The geometric/depth variants replace the unlearnable xy (and z)
regression with pinhole/depth recovery, which is why their ADD-0.1d is far
higher in both frameworks.

Runs on CPU by default so it can execute while the TPU chip is busy
training; restore races against the trainer's per-epoch orbax save are
retried via a /tmp snapshot.

Usage:
  python scripts/probe_components.py --workdir /root/repo/parity \
      --variants rgb rgb_geometric --ckpt best --append-md
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def snapshot_restore(save_dir: str, state, name: str):
    """Copy the checkpoint out of the live training dir, then restore.

    The trainer replaces `last`/`best` atomically-by-rename once per epoch;
    a direct restore can catch the window where the directory is absent.
    """
    from pose6d_tpu.train.checkpoint import CheckpointManager

    snap = os.path.join("/tmp", f"probe_snap_{os.path.basename(save_dir)}")
    for _ in range(10):
        try:
            shutil.rmtree(snap, ignore_errors=True)
            shutil.copytree(os.path.join(save_dir, name), os.path.join(snap, name))
            restored = CheckpointManager(snap).restore(state, name=name)
            if restored is not None:
                return restored
        except (FileNotFoundError, OSError):
            pass
        time.sleep(10)
    raise RuntimeError(f"could not restore {name} from {save_dir}")


def probe_variant(variant: str, workdir: str, ckpt: str, batches: int,
                  batch_size: int, num_workers: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.configs.presets import get_preset
    from pose6d_tpu.data.pipeline import LineMODPoseLoader
    from pose6d_tpu.geometry.quat import quat_normalize, quat_to_mat
    from pose6d_tpu.losses.add import ADDEvaluator, add_per_sample
    from pose6d_tpu.losses.pose_loss import geodesic_distance
    from pose6d_tpu.ops.augment import AugmentConfig, eval_preprocess
    from pose6d_tpu.train.loop import create_train_state, model_inputs, decompress_batch

    # run names carry parity_run's ablation suffixes (weights_<base><sufs>);
    # map them back to the TrainConfig flags so arms probe with their own
    # architecture (e.g. rgb_geometric_zbb, rgbd_noattn, *_widehead)
    base = variant
    for suf in ("_widehead", "_noattn", "_zeroattn", "_zbb", "_zwide",
                "_bf16", "_warmstart"):
        base = base.replace(suf, "")
    cfg = get_preset(
        base, augment=AugmentConfig(grayscale_p=0.0),
        rot_head_wide="_widehead" in variant,
        fusion_attention="_noattn" not in variant,
        attn_zero_init="_zeroattn" in variant,
        z_from_backbone="_zbb" in variant,
        z_backbone_wide="_zwide" in variant,
    )
    model, _, state = create_train_state(cfg, jax.random.key(0))
    save_dir = os.path.join(workdir, f"weights_{variant}")
    restored = snapshot_restore(save_dir, state, ckpt)
    state = restored["state"]

    flavor = "rgbd" if variant.startswith("rgbd") else "rgb"
    loader = LineMODPoseLoader(
        os.path.join(workdir, "synth", "data"), mode="val", flavor=flavor,
        img_size=cfg.img_size, augment_bbox=False, num_workers=num_workers,
        compact_arrays=True,
    )

    evaluator = ADDEvaluator(os.path.join(workdir, "synth", "models"))

    @jax.jit
    def forward(params, batch_stats, batch):
        batch = decompress_batch(batch)
        rgb = eval_preprocess(batch["rgb"])
        pred_rot, pred_trans = model.apply(
            {"params": params, "batch_stats": batch_stats},
            train=False, **model_inputs(cfg.variant, batch, rgb),
        )
        geo = geodesic_distance(pred_rot, quat_normalize(batch["quat"]))
        per = add_per_sample(
            evaluator.points, evaluator.diameters, evaluator.symmetric,
            evaluator.present, quat_to_mat(pred_rot), pred_trans,
            quat_to_mat(quat_normalize(batch["quat"])), batch["trans"],
            batch["obj_id"], num_valid=evaluator.num_valid,
        )
        return geo, pred_trans, per["effective"], per["correct"]

    geos, xy, z = [], [], []
    obj_eff: dict = {}
    obj_cor: dict = {}
    rng = np.random.default_rng(0)
    for i, batch in enumerate(loader.batches(batch_size, rng, shuffle=False,
                                             drop_remainder=True)):
        geo, pred_t, eff, cor = forward(state.params, state.batch_stats, batch)
        dt = np.asarray(pred_t) - np.asarray(batch["trans"])
        geos.append(float(geo))
        # Euclidean planar error ||(dx, dy)||, matching the |xy| column label
        xy.append(float(np.linalg.norm(dt[:, :2], axis=1).mean()))
        z.append(float(np.abs(dt[:, 2]).mean()))
        eff, cor = np.asarray(eff), np.asarray(cor)
        for oid in np.unique(batch["obj_id"]):
            sel = batch["obj_id"] == oid
            obj_eff.setdefault(int(oid), []).extend(eff[sel].tolist())
            obj_cor.setdefault(int(oid), []).extend(cor[sel].tolist())
        if batches and i + 1 >= batches:
            break
    diam_mm = 1000 * np.asarray(evaluator.diameters)
    per_object = {
        oid: {
            "diameter_mm": float(diam_mm[oid]),
            "add_mm": 1000 * float(np.mean(obj_eff[oid])),
            "add01d_pct": 100 * float(np.mean(obj_cor[oid])),
        }
        for oid in sorted(obj_eff)
    }
    return {
        "variant": variant,
        "ckpt": ckpt,
        "val_geodesic_deg": float(np.degrees(np.mean(geos))),
        "val_xy_err_mm": 1000 * float(np.mean(xy)),
        "val_z_err_mm": 1000 * float(np.mean(z)),
        "per_object": per_object,
    }


MD_HEADER = """
## Component attribution (val split, best checkpoints)

Rotation is the learned pathway in every variant; translation is regressed
(rgb/rgbd), pinhole-derived from a dedicated Z net (rgb_geometric), or
depth-derived (rgbd_geometric). The xy column explains the rgb variant's low
ADD-0.1d: a recentred crop contains no information about where in the image
it was taken from, so regressed x/y carries an irreducible positional error —
in our framework and in the reference architecture alike (its real-LineMOD
PoseNetRGB likewise trails every other variant at 13.35%).

| variant | val geodesic (deg) | val &#124;xy&#124; err (mm) | val &#124;z&#124; err (mm) |
|---|---|---|---|
"""


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=os.path.join(REPO, "parity"))
    ap.add_argument("--variants", nargs="+",
                    default=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"])
    ap.add_argument("--ckpt", default="best", choices=["best", "last"])
    ap.add_argument("--batches", type=int, default=0,
                    help="0 = the whole val split")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--append-md", action="store_true",
                    help="append the component table to PARITY_RESULTS.md")
    args = ap.parse_args()

    rows = []
    for v in args.variants:
        if not os.path.isdir(os.path.join(args.workdir, f"weights_{v}", args.ckpt)):
            print(f"[probe] {v}: no {args.ckpt} checkpoint yet, skipping")
            continue
        r = probe_variant(v, args.workdir, args.ckpt, args.batches,
                          args.batch_size, args.num_workers)
        rows.append(r)
        print(f"{v:<18} geodesic {r['val_geodesic_deg']:6.2f} deg | "
              f"xy {r['val_xy_err_mm']:6.1f} mm | z {r['val_z_err_mm']:6.1f} mm")
        for oid, o in r["per_object"].items():
            print(f"    obj {oid + 1:02d} (d={o['diameter_mm']:.0f}mm): "
                  f"ADD(-S) {o['add_mm']:6.1f} mm | ADD-0.1d {o['add01d_pct']:5.1f}%")

    if args.append_md and rows:
        parts = [MD_HEADER]
        for r in rows:
            parts.append(f"| {r['variant']} | {r['val_geodesic_deg']:.2f} "
                         f"| {r['val_xy_err_mm']:.1f} | {r['val_z_err_mm']:.1f} |\n")
        parts.append(
            "\nPer-object ADD(-S) / ADD-0.1d (val split; the 0.1d "
            "threshold scales with each object's diameter):\n\n"
            "| variant | " + " | ".join(
                f"obj {oid + 1:02d} (d={o['diameter_mm']:.0f}mm)"
                for oid, o in rows[0]["per_object"].items()) + " |\n"
            + "|---" * (len(rows[0]["per_object"]) + 1) + "|\n")
        for r in rows:
            parts.append(f"| {r['variant']} | " + " | ".join(
                f"{o['add_mm']:.0f}mm / {o['add01d_pct']:.0f}%"
                for o in r["per_object"].values()) + " |\n")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from parity_md import write_section

        path = write_section(args.workdir, "attribution", "".join(parts))
        print(f"wrote attribution section {path} and reassembled the document")


if __name__ == "__main__":
    main()
