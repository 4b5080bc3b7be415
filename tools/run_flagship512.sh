#!/bin/bash
# Flagship convergence at the flagship shape (VERDICT r3 #3): ResNet-50,
# 24^3 orientation soft-classification, image_scale 0.5 (512x640 pad64) —
# the released soyuz_hard configuration the bench serves — on the
# 960-image synthetic URSO set (same data budget as the resnet18 recipe,
# tools/run_classification24.sh).
#
# Usage: bash tools/run_flagship512.sh [epochs] [resume] [extra-args...]
#   epochs: target epoch count (x1000 steps each)
#   resume: pass 'resume' to continue with --weights last
set -e
cd "$(dirname "$0")/.."

EPOCHS="${1:-60}"
WEIGHTS="none"
[ "$2" = "resume" ] && WEIGHTS="last"
shift 2 2>/dev/null || shift $# 2>/dev/null || true

DS=/tmp/cls24_ds
if [ ! -f "$DS/soyuz_synth/train_images.csv" ]; then
  python - <<'EOF'
from ursonet_tpu.data.synthetic import make_urso_dataset
make_urso_dataset('/tmp/cls24_ds/soyuz_synth',
                  subsets=('train', 'val', 'test'),
                  n_per_subset={'train': 960, 'val': 96, 'test': 96},
                  width=1280, height=960, seed=7)
print('synthetic dataset ready')
EOF
fi

# 960 train images at 512x640 u8 = 944 MB: raise the device-resident cap
# so train+val stay on-chip (zero per-step host->device transfers).
python pose_estimator.py train \
  --dataset soyuz_synth --data_dir "$DS" --weights "$WEIGHTS" \
  --backbone resnet50 --classify_ori --ori_resolution 24 \
  --bottleneck 128 \
  --image_scale 0.5 --batch_size 32 --learn_rate 0.008 \
  --rot_aug --rot_image_aug --epochs "$EPOCHS" --steps_per_epoch 1000 \
  --set DATA_ON_DEVICE_MAX_MB=1200 \
  --logs /tmp/flagship512_logs --keep_checkpoints 3 "$@"
