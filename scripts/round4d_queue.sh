#!/bin/bash
# Round-4 fourth chip queue — runs AFTER scripts/round4c_queue.sh releases
# the chip (pass that shell's PID as $1; no pattern-matching process
# management). Repairs the fallout of stage C's 7200s retrain clipping:
# parity_e2e ran while rgbd was clipped at ~ep76 and rgbd_geometric had no
# round-4 checkpoint yet (stage E resumes/finishes them), so:
#   J. re-run the full-system e2e table against the finished round-4
#      checkpoints (detector already trained by stage C; rows merge into
#      e2e_results.json, one provenance)
#   K. stage D's float + int8 accuracy gates for rgbd_geometric (they ran
#      before its round-4 weights existed)
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 (round4c_queue.sh) to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [J] re-run e2e table on finished round-4 checkpoints ==="
timeout 7200 python scripts/parity_e2e.py --workdir /root/repo/parity \
  --skip-detector >parity/logs/r4_e2e_final.log 2>&1
echo "--- e2e rerun (exit $?)"

echo "=== [K] rgbd_geometric float + int8 gates (post stage-E weights) ==="
v=rgbd_geometric
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
echo "=== round4d queue complete ==="
