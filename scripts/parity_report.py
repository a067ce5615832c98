#!/usr/bin/env python
"""Assemble the final PARITY_RESULTS.md: tables + interpretation.

Rebuild order: base table (parity_summarize), component + per-object tables
(probe_components --append-md), full-system table (parity_e2e --md-only),
then this script appends the narrative that ties the numbers together,
reading them from parity/{results,e2e_results}.json.

Usage:  python scripts/parity_report.py --workdir /root/repo/parity
"""

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=os.path.join(REPO, "parity"))
    ap.add_argument("--round", default="5",
                    help="provenance label for the re-evaluation round")
    args = ap.parse_args()

    with open(os.path.join(args.workdir, "results.json")) as f:
        res = json.load(f)
    e2e = {}
    e2e_path = os.path.join(args.workdir, "e2e_results.json")
    if os.path.exists(e2e_path):
        with open(e2e_path) as f:
            e2e = json.load(f)

    def v(name, key, fmt="{:.2f}"):
        try:
            return fmt.format(res[name][key])
        except KeyError:
            return "n/a"

    def e(name, key, fmt="{:.2f}"):
        try:
            return fmt.format(e2e[name][key])
        except KeyError:
            return "n/a"

    text = f"""
## Reading the tables

**Both frameworks share the same architecture-bound error structure.** The
val-split table evaluates what the trainers optimize (GT-box crops,
predicted rotation AND translation), and there the learned-translation
variants are capped by an information bound: a recentred crop carries no
signal about where in the frame it came from, so regressed x/y has an
irreducible ~30 mm error on this fixture (probe table above) — the same
bound that leaves the reference's own PoseNetRGB at the bottom of its
real-LineMOD table (13.35%). Variants that recover translation
geometrically score higher in val, reproducing the reference's ordering for
three of the four variants: rgb {v('rgb', 'best_add01d')}% < rgb_geometric
{v('rgb_geometric', 'best_add01d')}% < rgbd_geometric
{v('rgbd_geometric', 'best_add01d')}%. The exception is rgbd
({v('rgbd', 'best_add01d')}% from scratch): on the reference's real data it
BEATS rgb (21.20 vs 13.35), on this fixture trained cold it comes last —
diagnosed (and, in round 4, resolved: 11.83% > rgb once the towers start
from a trained basin, the only regime the reference runs it in) in the
rgbd diagnosis section below.

**Deployment flips the story, exactly as the reference's inference scripts
do.** The deployed pipeline re-derives X/Y by pinhole from the detected box
center for every variant (reference: compare_visual.py re-derivation,
inference_*.py geometric paths), so the xy bound vanishes and accuracy is
set by rotation + z quality. The rgb variant — whose 2048-wide heads and
translation-supervised backbone converge to ~2.4 deg rotation and ~20 mm z
— jumps to {e('rgb', 'add01d_full')}% full-system ADD-0.1d behind the 0.973
mAP detector.

**Rotation-head capacity sets convergence speed, not the ceiling.** Both
geometric variants use the reference's smaller 1024/512 rotation head and
their backbones receive no translation gradients; on this from-scratch
recipe they spend tens of epochs on a ~18.8 deg val-geodesic plateau while
rgb's 2048-wide heads descend steadily to 2.46 deg. Round 3 completed the
budgets and resolved what the plateau means: rgbd_geometric with the
reference head ESCAPES after the plateau scheduler's first LR halving and
reaches {v('rgbd_geometric', 'best_add01d')}% val at epoch 69, while the
wide-head ablation reaches the same accuracy in 6 — capacity buys ~11×
faster convergence, not a different end point (ablation section below).
rgb_geometric remains bounded by its learned monocular z (deployed
{e('rgb_geometric', 'add01d_full')}%), a depth-information bound, not a
head bound. The reference's published numbers rely on an
ImageNet-pretrained backbone (unavailable here — zero egress) to make the
narrow heads converge within the published 75-epoch budget; with
`--pretrained-backbone` and real LineMOD, the same recipes run unchanged
through `scripts/train.py` and the golden-tested weight converter.

**Why this demonstrates parity.** The networks are numerically
interchangeable with the reference's (full-model forward golden tests, both
conversion directions); the data path is bit-exact on the eval side (golden
dataset tests); the losses/metrics match the reference's torch modules on
random batches; and the trainers demonstrably drive every pathway — the
detector to 0.973 mAP@50, rotation to a few degrees where the head is
wide, translation to the information bound. What separates these numbers
from the reference's published table is training inputs (pretrained
backbone + real data), not framework behavior.

**Round-{args.round} provenance + determinism.** Every table row above is a
round-{args.round} re-evaluation under ONE provenance: one detector
(retrained from scratch), the four round-{args.round} pose checkpoints,
current code. Detector training is deterministic given code + data (the
round-4 retrain reproduced round 3's curves to every printed digit); the
round-5 curves differ from the archived `metrics_round*.csv` because the
detector trainer changed mid-round-4 (scene-mix data path + nonfinite-step
guard) after the round-4 base detector had trained — mAP@50 lands at the
same level (0.973 vs 0.975). Pose training is bit-deterministic modulo
resume seams: the round-5 rgb and rgb_geometric curves reproduce round 4's
metrics_round4.csv to every printed digit across all 100 epochs (the
round-5 trainer change only ADDED a val column — val_acc_deploy — without
touching training RNG), and the rgbd curves match digit-for-digit up to
epoch 62 — the epoch where round 4's OWN mid-run resume re-seeded its
step-level RNG stream (round 5's rgbd hit a tunnel stall and resumed at
epoch 78, so the two runs sit on different resume branches after their
seams; rgbd best lands at 4.24% ep 63 here vs 4.91% ep 91 on round 4's
branch — same plateau, different noise sample). On learned-translation variants the
reference's best-by-val-ADD-0.1d selection rule is structurally misaligned
with deployment — it ranks checkpoints by the learned-xy pathway that the
deployed pipeline's geometric correction discards — and deployed accuracy
under it is noisy at fixture scale (rounds 3/4 measured a 60.8%-vs-27.6%
swing from this alone). The selection-rule study below quantifies the
effect per variant; the parity tables keep the reference's rule.
"""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_md import write_section

    path = write_section(args.workdir, "narrative", text)
    print(f"wrote narrative section {path} and reassembled the document")


if __name__ == "__main__":
    main()
