#!/usr/bin/env python
"""Update parity results.json + PARITY_RESULTS.md from on-disk metrics.csv.

For variants whose training was cut short of the full epoch budget (wall-
clock ends before fit() returns), parity_run.py never writes their summary;
this recomputes every variant's entry directly from its metrics.csv curve.

Usage:
  python scripts/parity_summarize.py --workdir /root/repo/parity
"""

import argparse
import importlib.util
import json
import os
import sys

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SCRIPTS))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=os.path.join(os.path.dirname(SCRIPTS), "parity"))
    ap.add_argument("--objects", type=int, default=6)
    ap.add_argument("--frames", type=int, default=700)
    ap.add_argument("--max-angle-deg", type=float, default=75.0)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--patience", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--early-stop-acc", type=float, default=97.0)
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "parity_run", os.path.join(SCRIPTS, "parity_run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # merge into the existing results.json (parity_run.py semantics): never
    # drop entries whose weights dir is gone, and pick up EVERY weights_*
    # dir on disk — including the *_widehead ablation runs
    results_path = os.path.join(args.workdir, "results.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)
    import glob

    for save_dir in sorted(glob.glob(os.path.join(args.workdir, "weights_*"))):
        variant = os.path.basename(save_dir)[len("weights_"):]
        csv_path = os.path.join(save_dir, "metrics.csv")
        if not os.path.exists(csv_path):
            continue
        import csv as _csv

        fields = ["epoch", "train_loss", "val_add", "val_add_s", "val_acc",
                  "lr", "steps_per_sec", "imgs_per_sec"]
        best = 0.0
        with open(csv_path) as f:
            first = f.readline()
            headerless = not first.startswith("epoch,")
            f.seek(0)
            reader = (_csv.DictReader(f, fieldnames=fields) if headerless
                      else _csv.DictReader(f))
            for row in reader:
                best = max(best, float(row["val_acc"]))
        if headerless:  # repair for summarize_variant, which expects a header
            with open(csv_path) as f:
                body = f.read()
            import shutil as _sh
            import tempfile

            tmpd = tempfile.mkdtemp()
            try:
                with open(os.path.join(tmpd, "metrics.csv"), "w") as f:
                    f.write(",".join(fields) + "\n" + body)
                results[variant] = mod.summarize_variant(tmpd, best)
            finally:
                _sh.rmtree(tmpd, ignore_errors=True)
        else:
            results[variant] = mod.summarize_variant(save_dir, best)

    with open(results_path, "w") as f:
        json.dump(results, f, indent=2)
    mod.write_markdown(args, results)
    for v, r in results.items():
        print(f"{v:<18} best {r['best_add01d']:6.2f}% @ epoch {r['best_epoch']} "
              f"({r['epochs_run']} run)")


if __name__ == "__main__":
    main()
