#!/bin/bash
# Round-3e chip queue (auto-chains after round-3d):
#  1. Retrain the fixture detector (the round-2 parity/yolo checkpoint was
#     not kept — only its metrics.csv) and refresh the detector-in-the-loop
#     table for rgbd_geometric, whose best checkpoint is now the COMPLETED
#     97.1% narrow-head run.
#  2. int8 accuracy gate: the SAME checkpoint + detector evaluated with
#     the full int8 serving mode (towers + detector PTQ,
#     eval_e2e --int8-backbone) vs the float run from step 1.
set -u
cd /root/repo
mkdir -p parity/logs
while ! grep -q "queue complete" /tmp/round3d_queue.out 2>/dev/null; do
  sleep 60
done
Q() {
  name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) queue: $name ==="
  timeout 14400 python "$@" >"parity/logs/$name.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done: $name (exit $?) ==="
}

Q e2e_rgbd_geometric scripts/parity_e2e.py --workdir /root/repo/parity \
  --variants rgbd_geometric
Q e2e_int8_gate scripts/eval_e2e.py --variant rgbd_geometric \
  --data-root /root/repo/parity/synth/data \
  --mesh-dir /root/repo/parity/synth/models \
  --yolo-weights /root/repo/parity/yolo \
  --pose-weights /root/repo/parity/weights_rgbd_geometric \
  --split test --int8-backbone
echo "=== queue complete ==="
