#!/bin/bash
# Round-3d chip queue (auto-chains after round-3c):
#  1. int8 MXU feasibility probe — measures whether XLA:TPU reaches the
#     s8 x s8 -> s32 conv path (v5e: 2x bf16 peak) from JAX, the gate for
#     the PTQ serving mode (ops/quant.py).
#  2. rgbd --attn-zero-init: the training-fix arm of the fusion-stall
#     diagnosis — attention ACTIVE but out_proj zero-init so optimization
#     starts from the (well-conditioned) concat landscape.
#  3. int8 rgbd e2e bench (only meaningful if the probe shows a speedup;
#     cheap either way).
set -u
cd /root/repo
mkdir -p parity/logs
# wait for round-3c to release the chip
while ! grep -q "queue complete" /tmp/round3c_queue.out 2>/dev/null; do
  sleep 60
done
Q() {
  name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) queue: $name ==="
  timeout 14400 python "$@" >"parity/logs/$name.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done: $name (exit $?) ==="
}

Q int8_probe scripts/probe_int8.py
Q rgbd_zeroattn scripts/parity_run.py --workdir /root/repo/parity \
  --attn-zero-init --variants rgbd --epochs 150
POSE6D_BENCH_INT8=1 Q bench_int8 bench.py
echo "=== queue complete ==="
