#!/bin/bash
# Round-3b chip queue: complete the diagnosis/recipe curves that earlier
# sessions cut short (each run RESUMES from its checkpoint; the trainer now
# runs device-resident at ~550 img/s f32 after the jnp.choose augmentation
# fix, so full-recipe completion is minutes, not hours).
#
#  1. rgbd_noattn   50 -> 150 epochs: the no-attention probe was cut at
#     12.05% val "and rising" — run it to plateau so the stall attribution
#     ("removing the attention residual unsticks the fused net") rests on a
#     completed curve, not an extrapolation.
#  2. rgbd_widehead 44 -> 75: full reference-length recipe for the
#     head-capacity ablation arm.
#  3. rgbd_geometric 51 -> 75: the base variant was cut at 51/75; complete
#     the reference's exact epoch budget.
set -u
cd /root/repo
mkdir -p parity/logs
Q() {
  name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) queue: $name ==="
  timeout 14400 python "$@" >"parity/logs/$name.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done: $name (exit $?) ==="
}

Q rgbd_noattn_ext scripts/parity_run.py --workdir /root/repo/parity \
  --no-fusion-attention --variants rgbd --epochs 150
Q rgbd_widehead_ext scripts/parity_run.py --workdir /root/repo/parity \
  --rot-head-wide --variants rgbd --epochs 75
Q rgbd_geometric_ext scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgbd_geometric --epochs 75
echo "=== queue complete ==="
