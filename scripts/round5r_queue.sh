#!/bin/bash
# Round-5 REDO bootstrap — the round snapshot wiped every gitignored
# artifact (parity/synth*, all orbax checkpoints, parity/yolo weights),
# so the round-5 evidence rebuild starts from fixtures:
#   0a. regenerate parity/synth (parity_run's own generator, 6 obj x 700)
#   0b. regenerate the eval scene (seed 9) + training scene trees (11/13)
#   0c. retrain the base detector (5 epochs, mAP@50 was 0.9726 this morning:
#       parity/logs/r5_train_yolo.log)
# then chain the two committed round-5 queues:
#   round5_queue.sh   (A archive, B retrain 4 variants, C e2e, D ft redo)
#   round5b_queue.sh  (E arms, F attribution, G selection, H gates, I docs,
#                      J perf)
set -u
cd /root/repo
mkdir -p parity/logs

echo "=== [0a] regenerate parity/synth ==="
python - <<'EOF' >parity/logs/r5_synth_regen.log 2>&1
from pose6d_tpu.data.synthetic import generate_synthetic_linemod
# exactly parity_run.py's auto-generation call (obj 1..6 x 700, seed 0,
# rotations bounded to a 75-deg geodesic ball) so stage B sees nothing missing
generate_synthetic_linemod(
    "parity/synth", obj_ids=tuple(range(1, 7)), frames_per_obj=700, seed=0,
    max_angle_deg=75.0)
print("synth regenerated")
EOF
echo "--- synth (exit $?)"

echo "=== [0b] regenerate scene fixtures ==="
python - <<'EOF' >parity/logs/r5_scene_regen.log 2>&1
import os
from pose6d_tpu.data.synthetic import recover_object_colors, generate_synthetic_scene
colors = recover_object_colors('parity/synth/data')
# tr_a / tr_b (seeds 11/13) are fully committed in-repo; only the held-out
# eval scene (seed 9) was gitignored and lost with the snapshot
for root, ids, seed, frames in (
        ("parity/synth_scene", (1, 2, 3, 4), 9, 120),
        ("parity/synth_scene_tr_a", (1, 2, 3, 4), 11, 300),
        ("parity/synth_scene_tr_b", (3, 4, 5, 6), 13, 300)):
    if os.path.isdir(os.path.join(root, "data", "01")):
        print(f"[scenes] {root} exists, skipping")
        continue
    generate_synthetic_scene(root, {k: colors[k] for k in ids},
                             frames=frames, seed=seed, max_angle_deg=75.0,
                             write_models=False)
    print(f"[scenes] wrote {root} (objects {ids}, seed {seed})")
EOF
echo "--- scenes (exit $?)"

echo "=== [0c] retrain base detector ==="
rm -rf parity/yolo/best parity/yolo/last
# metrics.csv appends across fits; park the round-4 curve (identical copy
# already archived as metrics_round4.csv) so the round-5 curve starts clean
if [ -f parity/yolo/metrics.csv ]; then rm parity/yolo/metrics.csv; fi
timeout 7200 python scripts/train_yolo.py \
  --data-root parity/synth/data --save-dir parity/yolo \
  --epochs 5 >parity/logs/r5_train_yolo.log 2>&1
echo "--- yolo (exit $?)"

bash scripts/round5_queue.sh
bash scripts/round5b_queue.sh
echo "=== round5r bootstrap + queues complete ==="
