#!/usr/bin/env python
"""Regenerate parity/results.json + the PARITY_RESULTS.md base table from
the metrics.csv curves on disk (no training, no chip).

Used after a resume repaired clipped runs: the in-flight parity_run
process summarizes with whatever code it loaded at start, so this
re-applies summarize_variant (with its resume-dedupe) to every variant
that has a curve, keeping each entry's best_add01d as the max val_acc in
the (deduped) curve.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_run import summarize_variant, write_markdown  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="parity")
    # the base-table header parameters (match parity_run defaults)
    ap.add_argument("--objects", type=int, default=6)
    ap.add_argument("--frames", type=int, default=700)
    ap.add_argument("--max-angle-deg", type=float, default=75.0)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--patience", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--early-stop-acc", type=float, default=97.0)
    args = ap.parse_args()

    results_path = os.path.join(args.workdir, "results.json")
    with open(results_path) as f:
        results = json.load(f)
    import csv

    for name in results:
        d = os.path.join(args.workdir, f"weights_{name}")
        csv_path = os.path.join(d, "metrics.csv")
        if not os.path.isfile(csv_path):
            continue
        with open(csv_path) as f:
            best = max((float(r["val_acc"]) for r in csv.DictReader(f)),
                       default=None)
        if best is None:
            continue
        results[name] = summarize_variant(d, best)
        print(f"[refresh] {name}: best {best:.2f} "
              f"({results[name]['epochs_run']} epochs)")
    with open(results_path, "w") as f:
        json.dump(results, f, indent=2)
    write_markdown(args, results)
    print(f"refreshed {results_path} and the base section")


if __name__ == "__main__":
    main()
