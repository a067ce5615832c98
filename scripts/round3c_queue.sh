#!/bin/bash
# Round-3c chip queue:
#  1. rgb_geometric wide-head: round 2 cut this ablation arm at epoch 42
#     (24.8% val, loss still descending) and its checkpoints are gone, so
#     run the arm FRESH to plateau/early-stop — the second complete data
#     point for the head-capacity ablation (VERDICT item 5).
#  2. rgbd --bf16, short fresh run at FULL parity scale (3,360 resident
#     frames): the 968 img/s mixed-precision number in PERF.md was measured
#     at N=256; this records the full-scale steady-state bf16 throughput.
set -u
cd /root/repo
mkdir -p parity/logs
Q() {
  name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) queue: $name ==="
  timeout 14400 python "$@" >"parity/logs/$name.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done: $name (exit $?) ==="
}

# preserve the round-2 curve before the fresh run appends from epoch 0
if [ -f parity/weights_rgb_geometric_widehead/metrics.csv ] && \
   [ ! -f parity/weights_rgb_geometric_widehead/metrics_round2.csv ]; then
  mv parity/weights_rgb_geometric_widehead/metrics.csv \
     parity/weights_rgb_geometric_widehead/metrics_round2.csv
fi

Q rgb_geometric_widehead_full scripts/parity_run.py --workdir /root/repo/parity \
  --rot-head-wide --variants rgb_geometric --epochs 150
Q rgbd_bf16_fullscale scripts/parity_run.py --workdir /root/repo/parity \
  --bf16 --variants rgbd --epochs 6
echo "=== queue complete ==="
