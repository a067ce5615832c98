#!/bin/bash
# Round-5 first chip queue — rebuild the full evidence system under ONE
# round-5 provenance (all round-4 checkpoints were lost with the round
# snapshot; parity/synth regenerated at the end of round 4, detector
# retrained at the start of this round: parity/logs/r5_train_yolo.log,
# mAP@50 0.9726). Stages:
#   A. archive stale round-4 curves (new metrics.csv gains val_acc_deploy)
#   B. retrain the four pose variants (Trainer now also tracks the
#      deployment-aligned best_deploy checkpoint per VERDICT round-4 #4)
#   C. full-system e2e table with the round-5 detector
#   D. round4i REDO (VERDICT round-4 #1): scene fine-tune of the detector
#      with the nonfinite-step guard at peak lr 1e-4, multiobj eval with
#      --yolo-checkpoint last on the held-out seed-9 scene, single-object
#      regression gates
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [A] archive stale round-4 curves ==="
for v in rgb rgb_geometric rgbd rgbd_geometric; do
  d="parity/weights_$v"
  if [ -f "$d/metrics.csv" ] && [ ! -d "$d/last" ]; then
    mv "$d/metrics.csv" "$d/metrics_round4.csv"
    echo "archived $d/metrics.csv -> metrics_round4.csv"
  fi
done

echo "=== [B] retrain 4 pose variants (round-5 provenance) ==="
timeout 10800 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgb rgb_geometric >parity/logs/r5_train_rgb.log 2>&1
echo "--- rgb+rgb_geometric (exit $?)"
timeout 10800 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgbd rgbd_geometric >parity/logs/r5_train_rgbd.log 2>&1
echo "--- rgbd+rgbd_geometric (exit $?)"

echo "=== [C] full-system e2e table (round-5 detector, test split) ==="
timeout 7200 python scripts/parity_e2e.py --workdir /root/repo/parity \
  --skip-detector >parity/logs/r5_e2e.log 2>&1
echo "--- e2e (exit $?)"

echo "=== [D] round4i redo: scene fine-tune + multiobj + regression gates ==="
rm -rf parity/yolo_ft
cp -r parity/yolo parity/yolo_ft
timeout 10800 python scripts/train_yolo.py \
  --data-root parity/synth/data --save-dir parity/yolo_ft \
  --scene-roots parity/synth_scene_tr_a/data,parity/synth_scene_tr_b/data \
  --epochs 9 --lr 1e-4 >parity/logs/r5_yolo_ft.log 2>&1
ft_rc=$?
echo "--- fine-tune redo (exit $ft_rc)"
if [ $ft_rc -eq 0 ] && [ -d parity/yolo_ft/last ]; then
  echo "=== [D] multiobj eval, fine-tuned (last) detector, held-out scene ==="
  for v in rgbd_geometric rgb; do
    timeout 3600 python scripts/eval_e2e.py --variant "$v" \
      --data-root parity/synth_scene/data --mesh-dir parity/synth/models \
      --yolo-weights parity/yolo_ft --yolo-checkpoint last \
      --pose-weights "parity/weights_$v" \
      --max-objects 4 --classes 1,2,3,4,5,6 --split train \
      >"parity/logs/r5_e2e_multiobj_ftlast_$v.log" 2>&1
    echo "--- multiobj-ftlast $v (exit $?)"
  done
  echo "=== [D] multiobj eval, BASE detector (round-5 baseline) ==="
  for v in rgbd_geometric rgb; do
    timeout 3600 python scripts/eval_e2e.py --variant "$v" \
      --data-root parity/synth_scene/data --mesh-dir parity/synth/models \
      --yolo-weights parity/yolo \
      --pose-weights "parity/weights_$v" \
      --max-objects 4 --classes 1,2,3,4,5,6 --split train \
      >"parity/logs/r5_e2e_multiobj_base_$v.log" 2>&1
    echo "--- multiobj-base $v (exit $?)"
  done
  echo "=== [D] single-object regression gate, fine-tuned (last) detector ==="
  for v in rgbd_geometric rgb; do
    timeout 3600 python scripts/eval_e2e.py --variant "$v" \
      --data-root parity/synth/data --mesh-dir parity/synth/models \
      --yolo-weights parity/yolo_ft --yolo-checkpoint last \
      --pose-weights "parity/weights_$v" \
      --split test >"parity/logs/r5_e2e_ftlast_singleobj_$v.log" 2>&1
    echo "--- singleobj-ftlast $v (exit $?)"
  done
else
  echo "ABORT: fine-tune redo failed — D evals skipped."
fi
echo "=== round5 queue (stages A-D) complete ==="
