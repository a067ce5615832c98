#!/bin/bash
# Round-3 chip training queue (sequential: ONE training owns the chip at a
# time; see PERF.md on tunnel dispatch). Logs under /root/repo/parity/logs/.
#
#  1. rgbd + wide rotation head  — flagship learning-stall diagnosis (the
#     round-2 attribution table shows rgbd stalls at the same ~18.8-deg
#     geodesic as the narrow-head geometric variants; its fused heads are
#     even narrower, 512/256).
#  2. rgbd without CrossModalAttention — isolates attention vs head capacity.
#  3. rgb_geometric + wide head — resume the round-2 run that was cut at
#     epoch 20 mid-descent; run to plateau for the second ablation point.
#  4. symmetric-object fixture run (fresh workdir) — trained-system ADD-S
#     evidence with eggbox/glue-slot symmetric objects.
set -u
cd /root/repo
mkdir -p parity/logs
Q() {
  name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) queue: $name ==="
  timeout 14400 python "$@" >"parity/logs/$name.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done: $name (exit $?) ==="
}

Q rgbd_widehead scripts/parity_run.py --workdir /root/repo/parity \
  --rot-head-wide --variants rgbd --epochs 75
Q rgbd_noattn scripts/parity_run.py --workdir /root/repo/parity \
  --no-fusion-attention --variants rgbd --epochs 50
Q rgb_geometric_widehead scripts/parity_run.py --workdir /root/repo/parity \
  --rot-head-wide --variants rgb_geometric --epochs 122
Q symmetric scripts/parity_run.py --workdir /root/repo/parity_sym \
  --symmetric-objects --rot-head-wide --variants rgbd_geometric --epochs 40
echo "=== queue complete ==="
