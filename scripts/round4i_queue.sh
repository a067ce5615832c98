#!/bin/bash
# Round-4 ninth chip queue — REDO of the scene fine-tune after the round4f
# arm diverged: resuming with --epochs 9 restarted the stretched
# warmup-cosine near its PEAK (6.6e-4 on a converged checkpoint), and one
# nonfinite step nuked every parameter through clip_by_global_norm's
# 0 * inf = NaN scale (parity/logs/yolo_ft.log, epochs 7-9 loss nan).
# Two fixes since: the train step skips nonfinite steps (GradScaler
# analogue, tests/test_det_trainer.py), and train_yolo.py grew --lr so a
# fine-tune resumes at ~6.6e-5 instead. Stages:
#   X. fresh parity/yolo_ft from parity/yolo; fine-tune epochs 6..9 at
#      peak lr 1e-4 on the scene mix
#   Y. multiobj eval (held-out seed-9 scene) with --yolo-checkpoint last —
#      the recall number to compare to the 72.4% baseline
#   Z. single-object regression gates with the same weights
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [X] fine-tune redo (peak lr 1e-4, nonfinite-step guard) ==="
rm -rf parity/yolo_ft
cp -r parity/yolo parity/yolo_ft
timeout 10800 python scripts/train_yolo.py \
  --data-root parity/synth/data --save-dir parity/yolo_ft \
  --scene-roots parity/synth_scene_tr_a/data,parity/synth_scene_tr_b/data \
  --epochs 9 --lr 1e-4 >parity/logs/yolo_ft2.log 2>&1
ft_rc=$?
echo "--- fine-tune redo (exit $ft_rc)"
if [ $ft_rc -ne 0 ] || [ ! -d parity/yolo_ft/last ]; then
  echo "ABORT: fine-tune redo failed — stages Y/Z skipped."
  exit 1
fi

echo "=== [Y] multiobj eval, fine-tuned (last) detector, held-out scene ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth_scene/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo_ft --yolo-checkpoint last \
    --pose-weights "parity/weights_$v" \
    --max-objects 4 --classes 1,2,3,4,5,6 --split train \
    >"parity/logs/e2e_multiobj_ftlast_$v.log" 2>&1
  echo "--- multiobj-ftlast $v (exit $?)"
done

echo "=== [Z] single-object regression gate, fine-tuned (last) detector ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo_ft --yolo-checkpoint last \
    --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_ftlast_singleobj_$v.log" 2>&1
  echo "--- singleobj-ftlast $v (exit $?)"
done
echo "=== round4i queue complete ==="
