#!/bin/bash
# Round-4 eighth chip queue — pin the multi-object evals to the fine-tuned
# detector. round4f's stages R/S load the detector with the default
# prefer="best"; the fine-tune resumes into a save-dir whose pre-existing
# best (mAP 0.9747 on the EASIER single-object val) may never be beaten by
# the harder mixed single+scene val, in which case R/S silently re-evaluated
# the OLD weights. This queue re-runs both eval arms with
# --yolo-checkpoint last: the unambiguous "after fine-tuning" detector.
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 (round4g_queue.sh) to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

if [ ! -d parity/yolo_ft/last ]; then
  echo "ABORT: parity/yolo_ft/last missing — fine-tune never produced weights."
  exit 1
fi

echo "=== [V] multiobj eval, fine-tuned (last) detector, held-out scene ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth_scene/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo_ft --yolo-checkpoint last \
    --pose-weights "parity/weights_$v" \
    --max-objects 4 --classes 1,2,3,4,5,6 --split train \
    >"parity/logs/e2e_multiobj_ftlast_$v.log" 2>&1
  echo "--- multiobj-ftlast $v (exit $?)"
done

echo "=== [W] single-object regression gate, fine-tuned (last) detector ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo_ft --yolo-checkpoint last \
    --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_ftlast_singleobj_$v.log" 2>&1
  echo "--- singleobj-ftlast $v (exit $?)"
done
echo "=== round4h queue complete ==="
