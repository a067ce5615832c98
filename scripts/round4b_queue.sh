#!/bin/bash
# Round-4 follow-up chip queue. Runs AFTER scripts/round4_queue.sh releases
# the chip (pass that shell's PID as $1 to wait on it; no pattern-matching
# process management). Stages:
#   E. finish any retrain the stage-C 7200s timeouts clipped — parity_run
#      resumes from last/ and is a cheap no-op for completed variants
#   F. multi-object scene evaluation (VERDICT round 3, item 9): 4-object
#      composited frames (parity/synth_scene, colors recovered from the
#      parity fixture so the detector sees its training appearances),
#      eval_e2e --max-objects 4 against the round-4 detector + pose weights
#   G. Pallas fused-layer1 on-chip probe (VERDICT item 3b): numerics gate,
#      then chained-difference timing vs XLA's conv lowering
#   H. bench.py snapshot with all serving fields
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 (round4_queue.sh) to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [E] finish clipped retrains (resume; no-op when complete) ==="
for pair in "rgb rgb_geometric" "rgbd rgbd_geometric"; do
  # shellcheck disable=SC2086
  timeout 7200 python scripts/parity_run.py --workdir /root/repo/parity \
    --variants $pair >>parity/logs/r4_resume.log 2>&1
  echo "--- resumed [$pair] (exit $?)"
done

echo "=== [F] multi-object scene eval (max_objects=4) ==="
if [ ! -d parity/synth_scene/data/01 ]; then
  python - <<'EOF'
from pose6d_tpu.data.synthetic import recover_object_colors, generate_synthetic_scene
colors = recover_object_colors('parity/synth/data')
generate_synthetic_scene('parity/synth_scene',
                         {k: colors[k] for k in (1, 2, 3, 4)},
                         frames=120, seed=9, max_angle_deg=75.0,
                         write_models=False)
EOF
fi
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth_scene/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo --pose-weights "parity/weights_$v" \
    --max-objects 4 --classes 1,2,3,4,5,6 --split train \
    >"parity/logs/e2e_multiobj_$v.log" 2>&1
  echo "--- multiobj $v (exit $?)"
done

echo "=== [G] Pallas fused-layer1 probe ==="
timeout 3600 python scripts/probe_pallas_block.py --batch 128 --chain 400 \
  >parity/logs/probe_pallas_block.log 2>&1
echo "--- probe (exit $?)"

echo "=== [H] bench snapshot ==="
timeout 5400 python bench.py >parity/logs/bench_r4.log 2>&1
echo "--- bench (exit $?)"
echo "=== round4b queue complete ==="
