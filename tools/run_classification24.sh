#!/bin/bash
# Flagship-algorithm demonstration at the released soyuz_hard orientation
# resolution: 24^3 soft-classification bins (VERDICT r2 #4).
#
# Re-runs the round-2 classification recipe (PERF.md: resnet18 at
# image_scale 0.2, batch 32, lr 8e-3 by the linear-scaling rule,
# rot_aug + rot_image_aug, device-resident data) with
# --ori_resolution 24. The 24^3 encoding floor is ~2.9 deg (BETA=6);
# round 2 decoded within 2.4 deg of the 16^3 floor.
#
# Usage: bash tools/run_classification24.sh [epochs] [resume]
#   epochs: default 90 (x1000 steps = the round-2 budget)
#   resume: pass 'resume' to continue with --weights last
set -e
cd "$(dirname "$0")/.."

EPOCHS="${1:-90}"
WEIGHTS="none"
[ "$2" = "resume" ] && WEIGHTS="last"

DS=/tmp/cls24_ds
if [ ! -f "$DS/soyuz_synth/train_images.csv" ]; then
  python - <<'EOF'
from ursonet_tpu.data.synthetic import make_urso_dataset
# the round-2 set: 960 images, seed 7, URSO render size
make_urso_dataset('/tmp/cls24_ds/soyuz_synth',
                  subsets=('train', 'val', 'test'),
                  n_per_subset={'train': 960, 'val': 96, 'test': 96},
                  width=1280, height=960, seed=7)
print('synthetic dataset ready')
EOF
fi

# --steps_per_epoch 1000 matches the round-2 recipe: without it the
# engine clamps epochs to n/batch = 30 steps (reference semantics) and
# 90 "epochs" would be 2.7k steps, not the 90k the recipe needs.
python pose_estimator.py train \
  --dataset soyuz_synth --data_dir "$DS" --weights "$WEIGHTS" \
  --backbone resnet18 --classify_ori --ori_resolution 24 \
  --image_scale 0.2 --batch_size 32 --learn_rate 0.008 \
  --rot_aug --rot_image_aug --epochs "$EPOCHS" --steps_per_epoch 1000 \
  --logs /tmp/cls24_logs --keep_checkpoints 3

# held-out evaluation, float and int8, on the converged checkpoint
python pose_estimator.py evaluate --dataset soyuz_synth --data_dir "$DS" \
  --backbone resnet18 --classify_ori --ori_resolution 24 \
  --image_scale 0.2 --weights last --logs /tmp/cls24_logs \
  --eval_batch 32 --out_dir /tmp/cls24_logs
python pose_estimator.py evaluate --dataset soyuz_synth --data_dir "$DS" \
  --backbone resnet18 --classify_ori --ori_resolution 24 \
  --image_scale 0.2 --weights last --logs /tmp/cls24_logs \
  --eval_batch 32 --out_dir /tmp/cls24_logs --int8
