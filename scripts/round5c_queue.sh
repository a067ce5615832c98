#!/bin/bash
# Round-5 continuation queue — the first queue's rgbd training hung on a
# tunnel RPC at epoch 78/100 (20 min without progress; socket drained,
# client parked on a futex) and the recovery intervention took the whole
# process tree down. This queue resumes exactly where it died:
#   B'. resume rgbd (orbax last @ epoch 78) + train rgbd_geometric
#   C.  full-system e2e table with the round-5 detector
#   D.  round4i REDO: scene fine-tune + multiobj evals + regression gates
# then chains round5b_queue.sh (H gates, G selection, I docs, J perf,
# E arms, F attribution).
set -u
cd /root/repo
mkdir -p parity/logs

echo "=== [B'] resume rgbd + train rgbd_geometric ==="
timeout 10800 python scripts/parity_run.py --workdir /root/repo/parity \
  --variants rgbd rgbd_geometric >>parity/logs/r5_train_rgbd.log 2>&1
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

bash scripts/round5b_queue.sh
echo "=== round5c queue complete ==="
