#!/bin/bash
# Round-5 second chip queue — runs AFTER round5_queue.sh (pass its PID).
# Ordered so the cheap, high-leverage evidence lands before the expensive
# training arms (the round has a hard wall clock; if it ends mid-arm,
# everything else has already landed):
#   H. serving-mode gates: float + int8 + folded (the folded path now runs
#      the bf16 epilogue fix — conv outputs/biases/residuals in bf16)
#   G1. selection study, rgb first (the variant with the measured 2.2x
#       deployed swing); incremental so a cutoff leaves a partial table
#   I. document assembly (multiobj table, serving table, narrative)
#   G2. selection study, remaining three variants
#   J. perf: fixed prefix profiles (all-leaf carry) + bench with the
#      top-1 NMS fast path + batch-1 latency refresh (the driver's own
#      end-of-round bench re-measures the headline even if J is cut)
#   E. rgb_geometric z-pathway diagnosis arms (VERDICT round-4 #5), each
#      bounded to the reference's 75-epoch budget: zbb (z off the ResNet50
#      features), warmstart (backbone grafted from the trained rgb donor),
#      zwide (double-width Z-CNN)
#   F. component attribution incl. whichever arms finished (z error is the
#      metric the arms exist to move; baseline 32.7 mm vs rgb's 21.3 mm)
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [H] serving-mode accuracy gates (float / int8 / folded) ==="
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
  timeout 3600 python scripts/eval_e2e.py --variant "$v" --folded-backbone \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_folded_$v.log" 2>&1
  echo "--- folded $v (exit $?)"
done

echo "=== [G1] checkpoint-selection study: rgb (the measured-swing variant) ==="
# per-variant invocations, learned-translation variants first: each rewrites
# the section from cumulative selection_results.json, so a wall-clock cutoff
# leaves a partial table instead of an empty one
timeout 3600 python scripts/selection_study.py --workdir /root/repo/parity \
  --variants rgb >parity/logs/r5_selection_rgb.log 2>&1
echo "--- selection rgb (exit $?)"

echo "=== [I] document assembly ==="
python scripts/multiobj_md.py >parity/logs/r5_multiobj_md.log 2>&1
echo "--- multiobj md (exit $?)"
python scripts/serving_md.py >parity/logs/r5_serving_md.log 2>&1
echo "--- serving md (exit $?)"
python scripts/parity_report.py --workdir /root/repo/parity --round 5 \
  >parity/logs/r5_report.log 2>&1
echo "--- report (exit $?)"

echo "=== [G2] checkpoint-selection study: remaining variants ==="
for v in rgbd rgbd_geometric rgb_geometric; do
  timeout 3600 python scripts/selection_study.py --workdir /root/repo/parity \
    --variants "$v" >"parity/logs/r5_selection_$v.log" 2>&1
  echo "--- selection $v (exit $?)"
done

echo "=== [J] perf: prefix profiles + bench ==="
timeout 3600 python scripts/profile_pipeline_prefix.py 128 rgbd \
  >parity/logs/prefix_rgbd_r5.log 2>&1
echo "--- prefix rgbd (exit $?)"
timeout 3600 python scripts/profile_pipeline_prefix.py 128 rgb \
  >parity/logs/prefix_rgb_r5.log 2>&1
echo "--- prefix rgb (exit $?)"
timeout 3600 python bench.py >parity/logs/r5_bench.log 2>&1
echo "--- bench (exit $?)"
timeout 5400 python scripts/bench_latency.py --variants rgb,rgbd \
  --batches 1,8 --int8 --chain 200 >parity/logs/r5_bench_latency.log 2>&1
echo "--- latency (exit $?)"

echo "=== [E] rgb_geometric diagnosis arms (75-epoch reference budget) ==="
timeout 7200 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgb_geometric --z-from-backbone --epochs 75 \
  >parity/logs/r5_arm_zbb.log 2>&1
echo "--- arm zbb (exit $?)"
timeout 7200 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgb_geometric --init-towers-from parity/weights_rgb \
  --donor-variant rgb --epochs 75 >parity/logs/r5_arm_warmstart.log 2>&1
echo "--- arm warmstart (exit $?)"
timeout 7200 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgb_geometric --z-backbone-wide --epochs 75 \
  >parity/logs/r5_arm_zwide.log 2>&1
echo "--- arm zwide (exit $?)"

echo "=== [F] component attribution (base variants + finished arms) ==="
timeout 3600 python scripts/probe_components.py --append-md \
  --variants rgb rgb_geometric rgbd rgbd_geometric \
  rgb_geometric_zbb rgb_geometric_warmstart rgb_geometric_zwide \
  >parity/logs/r5_probe.log 2>&1
echo "--- probe (exit $?)"
echo "=== round5b queue complete ==="
