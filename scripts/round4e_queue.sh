#!/bin/bash
# Round-4 fifth chip queue — runs AFTER scripts/round4d_queue.sh releases
# the chip (pass that shell's PID as $1; no pattern-matching process
# management). Closes the Pallas-fusion thread the round-4b probe opened:
# the first on-chip probe died in Mosaic ("Rotate with non-32-bit data" —
# pltpu.roll on bf16, parity/logs/probe_pallas_block.log); the kernel now
# routes sub-32-bit rolls through an exact f32 round-trip. Stages:
#   L. re-run the on-chip probe (numerics gate first, then chained-diff
#      timing of fused layer1 / stem / layer2 vs XLA's conv lowering)
#   M. (probe green) A/B the folded serving row on the full pipeline:
#      layer1-only vs +stem vs +stem+layer2 fusion
#   N. (probe green) accuracy gates for the fullest fusion config on the
#      trained checkpoints (rgbd_geometric: non-learned translation; rgb:
#      learned translation), mirroring the int8/folded gate pattern
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 (round4d_queue.sh) to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [L] re-run Pallas probe (bf16 roll fix) ==="
timeout 3600 python scripts/probe_pallas_block.py --batch 128 --chain 400 \
  >parity/logs/probe_pallas_block_r4e.log 2>&1
probe_rc=$?
echo "--- probe (exit $probe_rc)"

if [ $probe_rc -ne 0 ]; then
  echo "ABORT: probe still failing — stages M/N skipped (nothing to A/B)."
  exit 1
fi

echo "=== [M] folded-row A/B on the full pipeline ==="
timeout 5400 python - >parity/logs/folded_ab.log 2>&1 <<'EOF'
import json
import os
import sys

sys.path.insert(0, "/root/repo")
from bench import bench_e2e

rows = {}
for tag, stem, stages in [("l1_only", "0", ""),
                          ("stem_l1", "1", ""),
                          ("stem_l1_l2", "1", "1,2")]:
    os.environ["POSE6D_BENCH_FOLDED_STEM"] = stem
    os.environ["POSE6D_BENCH_FOLDED_STAGES"] = stages
    try:
        fps, method = bench_e2e(chain=100, variant="rgbd",
                                folded_backbone=True)
    except Exception as e:  # noqa: BLE001 — record, keep other combos
        rows[tag] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(f"[folded-ab] {tag}: FAILED {type(e).__name__}",
              file=sys.stderr)
        continue
    rows[tag] = {"fps": round(fps, 1), "method": method}
    print(f"[folded-ab] {tag}: {fps:.1f} fps ({method})", file=sys.stderr)
print(json.dumps({"metric": "folded_ab_rgbd", "rows": rows}))
EOF
echo "--- folded A/B (exit $?)"

echo "=== [N] accuracy gates: folded serving configs ==="
# N1: stage I's plain folded gates, re-run — their first pass compiled
# before the scoped-VMEM fix landed and died in Mosaic (e2e_folded_*.log)
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" --folded-backbone \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_folded_$v.log" 2>&1
  echo "--- folded $v (exit $?)"
done
# N2: fullest fusion config (stem + layer1 + layer2)
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" --folded-backbone \
    --folded-stem --folded-stages 1,2 \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_folded_fused_$v.log" 2>&1
  echo "--- folded+fused $v (exit $?)"
done
echo "=== round4e queue complete ==="
