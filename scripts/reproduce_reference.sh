#!/bin/bash
# One-command reproduction of the reference's published LineMOD table.
#
# Encodes the full readiness path for verifying accuracy parity against the
# reference (SFR-Vision/6d-pose-estimation, /root/reference/README.md:28-33):
#
#   download -> detector training -> 4x pose training (ImageNet-pretrained
#   backbones) -> compare table -> +-0.5% absolute parity gate
#
# Reference targets (val ADD-0.1d %, /root/reference/README.md:28-33):
#   rgb 13.35 | rgb_geometric 23.20 | rgbd 21.20 | rgbd_geometric 27.45
#
# Requirements for the real run (both blocked in a zero-egress environment;
# this script is the one command to run the moment they are available):
#   * network access for the LineMOD download (scripts/setup_data.py, gdown)
#     OR Linemod_preprocessed.zip pre-placed at <workdir>/datasets/
#   * a torchvision ImageNet resnet50 state_dict (.pth) via --resnet50-pth —
#     load-bearing for the published accuracies (reference
#     models/pose_net_rgb.py:18-19); converted by models/convert.py
#     (converter golden-tested vs real torch math in tests/test_torch_golden.py)
#
# --dry-run validates the entire command graph on the hermetic synthetic
# fixture at tiny sizes (no network, no weights, CPU-safe; exercised by
# tests/test_cli_smoke.py). The accuracy gate is skipped in dry-run — fixture
# accuracies are not the reference's real-data numbers.
#
# Usage:
#   bash scripts/reproduce_reference.sh --resnet50-pth /path/resnet50.pth
#   bash scripts/reproduce_reference.sh --dry-run [--workdir /tmp/x]
set -euo pipefail
cd "$(dirname "$0")/.."

DRY_RUN=0
WORKDIR=reproduce
RESNET_PTH=""
while [ $# -gt 0 ]; do
  case "$1" in
    --dry-run) DRY_RUN=1 ;;
    --workdir) WORKDIR="$2"; shift ;;
    --resnet50-pth) RESNET_PTH="$2"; shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done
mkdir -p "$WORKDIR"

if [ "$DRY_RUN" -eq 1 ]; then
  # hermetic synthetic fixture, tiny sizes (same knobs as scripts/demo.py)
  python scripts/setup_data.py --dest "$WORKDIR/datasets" --synthetic \
    --objects 2 --frames 20
  DATA="$WORKDIR/datasets/Linemod_synthetic/data"
  MESH="$WORKDIR/datasets/Linemod_synthetic/models"
  POSE_ARGS=(--epochs 1 --img-size 32 --batch-size 4 --num-workers 0)
  YOLO_ARGS=(--epochs 1 --img-size 96 --batch-size 4)
  CMP_ARGS=(--img-size 32 --batch-size 4)
  E2E_ARGS=(--img-size 32 --batch-size 4 --conf-thresh 0.0)
  PRETRAIN_ARGS=()
else
  # real LineMOD + reference recipe (presets encode 75 epochs, batch 32,
  # AdamW 1e-4/1e-4, plateau patience 5, the reference's augmentations)
  if [ -z "$RESNET_PTH" ]; then
    echo "ERROR: --resnet50-pth <torchvision resnet50 .pth> is required for" >&2
    echo "       the real run; the published accuracies depend on the" >&2
    echo "       ImageNet init (reference models/pose_net_rgb.py:18-19)." >&2
    exit 2
  fi
  python scripts/setup_data.py --dest "$WORKDIR/datasets"
  DATA="$WORKDIR/datasets/Linemod_preprocessed/data"
  MESH="$WORKDIR/datasets/Linemod_preprocessed/models"
  POSE_ARGS=()
  YOLO_ARGS=()   # reference recipe defaults: 5 epochs, imgsz 640, batch 16
  CMP_ARGS=()
  E2E_ARGS=()
  PRETRAIN_ARGS=(--pretrained-backbone "$RESNET_PTH")
fi

echo "=== [1/5] YOLO-layout dataset artifact (reference prepare_yolo parity)"
python scripts/prepare_yolo.py --source "$DATA" --dest "$WORKDIR/yolo_dataset"

echo "=== [2/5] detector training (native Flax YOLOv8n)"
python scripts/train_yolo.py --data-root "$DATA" \
  --save-dir "$WORKDIR/yolo" "${YOLO_ARGS[@]}"

echo "=== [3/5] pose training: 4 variants"
for v in rgb rgb_geometric rgbd rgbd_geometric; do
  python scripts/train.py --variant "$v" --data-root "$DATA" \
    --mesh-dir "$MESH" --save-dir "$WORKDIR/weights_$v" \
    "${POSE_ARGS[@]}" ${PRETRAIN_ARGS[@]+"${PRETRAIN_ARGS[@]}"}
done

echo "=== [4/5] compare table + parity gate"
python scripts/compare.py --data-root "$DATA" --mesh-dir "$MESH" \
  --weights-root "$WORKDIR" --json-out "$WORKDIR/reproduce_results.json" \
  "${CMP_ARGS[@]}"


echo "=== [5/5] full-system e2e + serving-mode accuracy gates"
# Detector-in-the-loop evaluation of the deployed pipeline, then the two
# opt-in serving modes (int8 PTQ towers+detector, folded-bf16 towers) gated
# against the float numbers — the round-4 evidence suite, not just the
# GT-box compare table. --yolo-checkpoint pins which detector checkpoint
# deploys (best = highest val mAP; pass last after a fine-tune whose harder
# mixed-val mAP never beats the stored best — see train_yolo --scene-roots).
# dry-run compiles each eval pipeline from scratch on CPU, so it gates one
# variant through all three modes; the real run gates both evidence variants
if [ "$DRY_RUN" -eq 1 ]; then E2E_VARIANTS=(rgbd_geometric); else E2E_VARIANTS=(rgb rgbd_geometric); fi
for v in "${E2E_VARIANTS[@]}"; do
  for mode in "" --int8-backbone --folded-backbone; do
    python scripts/eval_e2e.py --variant "$v" --data-root "$DATA" \
      --mesh-dir "$MESH" --yolo-weights "$WORKDIR/yolo" --yolo-checkpoint best \
      --pose-weights "$WORKDIR/weights_$v" --split test \
      ${mode:+"$mode"} ${E2E_ARGS[@]+"${E2E_ARGS[@]}"}
  done
done

DRY_RUN="$DRY_RUN" WORKDIR="$WORKDIR" python - <<'EOF'
import json, os, sys

# published val ADD-0.1d targets, /root/reference/README.md:28-33
TARGETS = {"rgb": 13.35, "rgb_geometric": 23.20,
           "rgbd": 21.20, "rgbd_geometric": 27.45}
TOL = 0.5  # +-0.5% absolute (BASELINE.md parity gate)

path = os.path.join(os.environ["WORKDIR"], "reproduce_results.json")
results = json.load(open(path))
missing = [v for v in TARGETS if v not in results]
if missing:
    sys.exit(f"parity gate: missing variants in {path}: {missing}")

if os.environ["DRY_RUN"] == "1":
    for v in TARGETS:
        acc = results[v]["add_01d_acc"]
        assert isinstance(acc, float), (v, acc)
    print("dry-run OK: command graph green, all 4 variants evaluated "
          "(accuracy gate skipped on the synthetic fixture)")
    sys.exit(0)

failed = []
print(f"{'variant':<18} {'ours':>7} {'reference':>10} {'|diff|':>7}  gate")
for v, ref in TARGETS.items():
    acc = results[v]["add_01d_acc"]
    diff = abs(acc - ref)
    ok = diff <= TOL
    print(f"{v:<18} {acc:>7.2f} {ref:>10.2f} {diff:>7.2f}  "
          f"{'PASS' if ok else 'FAIL'}")
    if not ok:
        failed.append(v)
sys.exit(f"parity gate FAILED for: {failed}" if failed else 0)
EOF
