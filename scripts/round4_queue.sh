#!/bin/bash
# Round-4 chip queue (VERDICT.md round 3, items 1/2/5/6):
#   A. serving-latency table (bounded, runs first so it always lands)
#   B. round-3f warm-start experiment: donor rgbd_noattn -> grafted rgbd
#      (closes the rgbd attention-stall diagnosis)
#   C. re-unified full-system retrain: fresh detector + all four variants
#      under ONE provenance (round-3 checkpoints were lost with the round
#      snapshot — weights dirs are gitignored), then the e2e table
#   D. int8 accuracy gates: rgbd_geometric (round-3 parity) AND rgb (the
#      learned-translation variant the round-3 gate never covered)
#
# Round-3 metrics.csv curves in parity/weights_* are renamed to
# metrics_round3.csv (same convention as the existing metrics_round3a.csv)
# so fresh training never appends to a stale curve.
set -u
cd /root/repo
mkdir -p parity_ws/logs parity/logs

echo "=== [A] serving latency (bf16 + int8, rgb + rgbd, batch 1/8/32) ==="
timeout 5400 python scripts/bench_latency.py --variants rgb,rgbd \
  --batches 1,8,32 --int8 --chain 200 >parity/logs/bench_latency.log 2>&1
echo "=== [A] done (exit $?) ==="

echo "=== [B] warm-start experiment (scripts/round3f_queue.sh) ==="
bash scripts/round3f_queue.sh
echo "=== [B] done (exit $?) ==="

echo "=== [C] re-unified system: archive stale curves, retrain 4 variants ==="
for v in rgb rgb_geometric rgbd rgbd_geometric; do
  d="parity/weights_$v"
  if [ -f "$d/metrics.csv" ] && [ ! -d "$d/last" ]; then
    mv "$d/metrics.csv" "$d/metrics_round3.csv"
    echo "archived $d/metrics.csv -> metrics_round3.csv"
  fi
done
timeout 7200 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgb rgb_geometric >parity/logs/r4_train_rgb.log 2>&1
echo "=== [C] rgb+rgb_geometric done (exit $?) ==="
timeout 7200 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgbd rgbd_geometric >parity/logs/r4_train_rgbd.log 2>&1
echo "=== [C] rgbd+rgbd_geometric done (exit $?) ==="

echo "=== [C] detector + e2e table (test split) ==="
timeout 7200 python scripts/parity_e2e.py --workdir /root/repo/parity \
  >parity/logs/r4_e2e.log 2>&1
echo "=== [C] e2e done (exit $?) ==="

echo "=== [D] int8 accuracy gates ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_float_$v.log" 2>&1
  echo "--- float $v (exit $?)"
  timeout 3600 python scripts/eval_e2e.py --variant "$v" --int8-backbone \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_int8_$v.log" 2>&1
  echo "--- int8 $v (exit $?)"
done
echo "=== queue complete ==="
