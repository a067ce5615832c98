#!/bin/bash
# Round-4 sixth chip queue — the multi-object RECALL experiment. The round-4b
# multiobj eval showed per-object pose quality transfers (91.4% ADD-0.1d on
# matched detections) but full-system accuracy is bounded by detector recall
# on cluttered frames (72.4% — the detector only ever saw single-object
# frames). Commit b357dab added the scene fine-tune data path; this queue
# RUNS it, with strict train/eval separation:
#   - training scenes: NEW trees (seeds 11/13, objects {1..4} and {3..6})
#     used only for fine-tuning
#   - eval scene: the ORIGINAL parity/synth_scene (seed 9) stays fully held
#     out, so the 72.4% baseline comparison is apples-to-apples
# Stages:
#   P. generate the training scene trees (CPU, idempotent)
#   Q. fine-tune: copy parity/yolo -> parity/yolo_ft, resume at epoch 5,
#      run epochs 6..9 with scene frames mixed into train+val
#   R. multiobj eval (max_objects=4) on the held-out seed-9 fixture with
#      the fine-tuned detector — the recall number to compare to 72.4%
#   S. single-object regression gates: eval_e2e on the parity fixture test
#      split with the fine-tuned detector (must hold vs the one-provenance
#      table: rgbd_geometric 96.06%, rgb 27.60%)
set -u
cd /root/repo
mkdir -p parity/logs

if [ $# -ge 1 ]; then
  echo "=== waiting for PID $1 to exit ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== [P] generate training scene trees ==="
python - <<'EOF'
from pose6d_tpu.data.synthetic import recover_object_colors, generate_synthetic_scene
import os
colors = recover_object_colors('parity/synth/data')
for root, ids, seed in (("parity/synth_scene_tr_a", (1, 2, 3, 4), 11),
                        ("parity/synth_scene_tr_b", (3, 4, 5, 6), 13)):
    if os.path.isdir(os.path.join(root, "data", "01")):
        print(f"[scenes] {root} exists, skipping")
        continue
    generate_synthetic_scene(root, {k: colors[k] for k in ids},
                             frames=300, seed=seed, max_angle_deg=75.0,
                             write_models=False)
    print(f"[scenes] wrote {root} (objects {ids}, seed {seed})")
EOF
echo "--- scenes (exit $?)"

echo "=== [Q] fine-tune detector on scenes (resume epochs 6..9) ==="
if [ ! -d parity/yolo_ft ]; then
  cp -r parity/yolo parity/yolo_ft
fi
timeout 10800 python scripts/train_yolo.py \
  --data-root parity/synth/data --save-dir parity/yolo_ft \
  --scene-roots parity/synth_scene_tr_a/data,parity/synth_scene_tr_b/data \
  --epochs 9 >parity/logs/yolo_ft.log 2>&1
ft_rc=$?
echo "--- fine-tune (exit $ft_rc)"
if [ $ft_rc -ne 0 ]; then
  echo "ABORT: fine-tune failed — stages R/S skipped (nothing to evaluate)."
  exit 1
fi

echo "=== [R] multiobj eval with fine-tuned detector (held-out seed-9 scene) ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth_scene/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo_ft --pose-weights "parity/weights_$v" \
    --max-objects 4 --classes 1,2,3,4,5,6 --split train \
    >"parity/logs/e2e_multiobj_ft_$v.log" 2>&1
  echo "--- multiobj-ft $v (exit $?)"
done

echo "=== [S] single-object regression gates with fine-tuned detector ==="
for v in rgbd_geometric rgb; do
  timeout 3600 python scripts/eval_e2e.py --variant "$v" \
    --data-root parity/synth/data --mesh-dir parity/synth/models \
    --yolo-weights parity/yolo_ft --pose-weights "parity/weights_$v" \
    --split test >"parity/logs/e2e_ft_singleobj_$v.log" 2>&1
  echo "--- singleobj-ft $v (exit $?)"
done
echo "=== round4f queue complete ==="
