#!/usr/bin/env python
"""Full-system parity evidence: detector-in-the-loop eval on the fixture.

Stage 2 of the accuracy-parity run (stage 1 = scripts/parity_run.py trains
the four pose variants). This script:

  1. trains the native YOLOv8n detector on the same synthetic LineMOD tree
     (reference recipe: 5 epochs, imgsz 640, batch 16, seed 42 —
     /root/reference/scripts/training/train_yolo.py:21-25), resumable;
  2. runs scripts/eval_e2e.py (trained detector -> device crop -> pose net)
     for every trained pose variant on the test split;
  3. appends the resulting detection-rate + ADD table to PARITY_RESULTS.md.

Usage (real chip, after/while parity_run.py completes variants):
  python scripts/parity_e2e.py --workdir /root/repo/parity
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.dirname(os.path.abspath(__file__))


def run(cmd, log_path):
    print("+", " ".join(cmd), flush=True)
    with open(log_path, "a") as log:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
        log.write(proc.stdout)
    print(proc.stdout[-2000:])
    if proc.returncode != 0:
        raise RuntimeError(f"{cmd[1]} failed rc={proc.returncode}")
    return proc.stdout


def parse_e2e(stdout: str) -> dict:
    """Pull the metric lines out of eval_e2e.py's report."""
    out = {}
    patterns = {
        "det_rate": r"detection rate: ([\d.]+)%",
        "cls_acc": r"class acc \(of detected\): ([\d.]+)%",
        "add_mm": r"ADD \(detected\): ([\d.]+)mm",
        "add_s_mm": r"ADD-S \(detected\): ([\d.]+)mm",
        "add01d_det": r"ADD-0\.1d \(detected\): ([\d.]+)%",
        "add01d_full": r"full system, undetected = incorrect\): ([\d.]+)%",
    }
    for key, pat in patterns.items():
        m = re.search(pat, stdout)
        if m:
            out[key] = float(m.group(1))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=os.path.join(REPO, "parity"))
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--split", default="test", choices=["val", "test"])
    ap.add_argument("--variants", nargs="+",
                    default=["rgb", "rgb_geometric", "rgbd", "rgbd_geometric"])
    ap.add_argument("--skip-detector", action="store_true",
                    help="reuse an already-trained detector in <workdir>/yolo")
    ap.add_argument("--md-only", action="store_true",
                    help="re-append the markdown table from the saved "
                         "e2e_results.json without running anything")
    args = ap.parse_args()

    data_root = os.path.join(args.workdir, "synth", "data")
    mesh_dir = os.path.join(args.workdir, "synth", "models")
    yolo_dir = os.path.join(args.workdir, "yolo")
    log_path = os.path.join(args.workdir, "e2e_run.log")

    if args.md_only:
        with open(os.path.join(args.workdir, "e2e_results.json")) as f:
            results = json.load(f)
        write_markdown(args, results)
        return

    if not args.skip_detector:
        run([sys.executable, os.path.join(SCRIPTS, "train_yolo.py"),
             "--data-root", data_root, "--save-dir", yolo_dir,
             "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
             "--img-size", str(args.img_size)], log_path)

    out_json = os.path.join(args.workdir, "e2e_results.json")
    results = {}
    if os.path.exists(out_json):  # merge across incremental invocations
        with open(out_json) as f:
            results = json.load(f)
    for variant in args.variants:
        pose_dir = os.path.join(args.workdir, f"weights_{variant}")
        if not os.path.isdir(os.path.join(pose_dir, "best")):
            print(f"[e2e] {variant}: no trained weights, skipping")
            continue
        stdout = run([sys.executable, os.path.join(SCRIPTS, "eval_e2e.py"),
                      "--variant", variant, "--data-root", data_root,
                      "--mesh-dir", mesh_dir, "--yolo-weights", yolo_dir,
                      "--pose-weights", pose_dir, "--split", args.split],
                     log_path)
        results[variant] = parse_e2e(stdout)

    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    write_markdown(args, results)
    print(f"wrote {out_json} and appended table to PARITY_RESULTS.md")


def write_markdown(args, results: dict) -> None:
    parts = [
        "## Full-system (detector-in-the-loop) evaluation\n\n"
        f"Native YOLOv8n trained {args.epochs} epochs on the fixture "
        "(reference recipe), then the COMPLETE deployed pipeline — "
        "detector -> device crop -> pose net — evaluated on the "
        f"{args.split} split by scripts/eval_e2e.py. The reference has no "
        "equivalent full-system metric (its comparisons use GT boxes).\n\n"
        "| variant | det rate % | cls acc % | ADD mm | ADD-S mm | "
        "ADD-0.1d (detected) % | ADD-0.1d (full system) % |\n"
        "|---|---|---|---|---|---|---|\n"
    ]
    for v, r in results.items():
        parts.append(f"| {v} | {r.get('det_rate', float('nan')):.1f} "
                     f"| {r.get('cls_acc', float('nan')):.1f} "
                     f"| {r.get('add_mm', float('nan')):.1f} "
                     f"| {r.get('add_s_mm', float('nan')):.1f} "
                     f"| {r.get('add01d_det', float('nan')):.2f} "
                     f"| {r.get('add01d_full', float('nan')):.2f} |\n")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_md import write_section

    write_section(args.workdir, "e2e", "".join(parts))


if __name__ == "__main__":
    main()
