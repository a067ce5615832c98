#!/bin/bash
# Round-4 third chip queue — runs AFTER scripts/round4b_queue.sh releases
# the chip (pass that shell's PID as $1; no pattern-matching process
# management). One stage:
#   I. folded-bf16 serving-mode accuracy gates (VERDICT round 3, item 3):
#      eval_e2e --folded-backbone on the two trained checkpoints the int8
#      gates cover (rgbd_geometric: non-learned translation; rgb: learned
#      translation) — the accuracy side of bench.py's rgbd_folded row.
#      Float baselines for the same split come from stage D's
#      parity/logs/e2e_float_*.log.
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 (round4b_queue.sh) to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [I] folded-bf16 accuracy gates ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" --folded-backbone \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_folded_$v.log" 2>&1
  echo "--- folded $v (exit $?)"
done
echo "=== round4c queue complete ==="
