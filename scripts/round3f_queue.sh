#!/bin/bash
# Round-3f chip queue: the warm-start arm of the rgbd fusion-stall
# diagnosis. Hypothesis under test (PARITY_RESULTS.md, diagnosis section):
# the attention pathway stalls from SCRATCH but not from a pretrained
# basin — the reference always trains it from ImageNet towers. With no
# egress for ImageNet weights, the fixture-native analogue is:
#   1. train the donor: rgbd_noattn (concat fusion — the configuration
#      that descends steadily), fresh workdir parity_ws/
#   2. train rgbd (attention ON, reference architecture) with both towers
#      grafted from the donor's best checkpoint
#      (parity_run.py --init-towers-from, train/warmstart.py)
# If (2) escapes the 4.5% plateau, the pretrained-basin hypothesis is
# demonstrated on-fixture; if it stalls again, the stall is intrinsic to
# the attention dynamics regardless of tower quality.
set -u
cd /root/repo
mkdir -p parity_ws/logs
Q() {
  name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) queue: $name ==="
  timeout 7200 python "$@" >"parity_ws/logs/$name.log" 2>&1
  rc=$?
  echo "=== $(date -u +%H:%M:%S) done: $name (exit $rc) ==="
  return $rc
}

Q donor_rgbd_noattn scripts/parity_run.py --workdir /root/repo/parity_ws \
  --variants rgbd --no-fusion-attention --epochs 75
donor_rc=$?

# The warm-start arm is only meaningful with a fully trained donor: if the
# donor step failed or timed out mid-training, load_model_variables would
# silently fall back to a barely-trained 'last' checkpoint and the
# pretrained-basin experiment would produce a misleading negative result.
if [ $donor_rc -ne 0 ] || [ ! -d parity_ws/weights_rgbd_noattn/best ]; then
  echo "ABORT: donor run failed (exit $donor_rc) or no 'best' checkpoint at"
  echo "       parity_ws/weights_rgbd_noattn/best — warm-start arm skipped."
  exit 1
fi

Q rgbd_warmstart scripts/parity_run.py --workdir /root/repo/parity_ws \
  --variants rgbd --epochs 75 \
  --init-towers-from /root/repo/parity_ws/weights_rgbd_noattn \
  --donor-variant rgbd_noattn
echo "=== queue complete ==="
