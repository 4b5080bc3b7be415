#!/bin/bash
# Benchmark config #4 (BASELINE.md): SPEED training with sim2real
# augmentation + cyclical LR — the first end-to-end exercise of the CLR
# schedule (train/optim.clr_schedule, reference clr_callback.py:4-133)
# and the fused device-side sim2real pipeline in one training recipe.
#
# Synthetic SPEED set (grayscale JPEGs + scalar-first quaternions,
# data/synthetic.make_speed_dataset) at camera-consistent 384x240 renders
# (= published 1920x1200 intrinsics x image_scale 0.2).
#
# Usage: bash tools/run_config4_speed.sh [epochs] [resume]
set -e
cd "$(dirname "$0")/.."

EPOCHS="${1:-20}"
WEIGHTS="none"
[ "$2" = "resume" ] && WEIGHTS="last"

DS=/tmp/speed_ds
if [ ! -f "$DS/speed/train_no_val.json" ]; then
  python - <<'EOF'
from ursonet_tpu.data.synthetic import make_speed_dataset
make_speed_dataset('/tmp/speed_ds/speed',
                   subsets=('train_no_val', 'val', 'test'),
                   n_per_subset={'train_no_val': 480, 'val': 48,
                                 'test': 48},
                   width=384, height=240, seed=11)
print('synthetic SPEED dataset ready')
EOF
fi

# CLR triangular between 1e-3 and 8e-3 (linear-scaling max for batch 32),
# 2000-step half-cycle: 1000-step epochs sweep a full cycle every 4 epochs.
python pose_estimator.py train \
  --dataset speed --data_dir "$DS" --weights "$WEIGHTS" \
  --backbone resnet18 --classify_ori --ori_resolution 16 \
  --image_scale 0.2 --batch_size 32 \
  --sim2real --clr \
  --set BASE_LEARNING_RATE=0.001 --set MAX_LEARNING_RATE=0.008 \
  --set CLR_STEP_SIZE=2000 \
  --epochs "$EPOCHS" --steps_per_epoch 1000 \
  --logs /tmp/speed_clr_logs --keep_checkpoints 2

# held-out evaluation (decoded ESA on the synthetic test split)
python pose_estimator.py evaluate --dataset speed --data_dir "$DS" \
  --backbone resnet18 --classify_ori --ori_resolution 16 \
  --image_scale 0.2 --weights last --logs /tmp/speed_clr_logs \
  --eval_batch 32 --out_dir /tmp/speed_clr_logs
