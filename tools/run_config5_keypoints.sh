#!/bin/bash
# Benchmark config #5 (BASELINE.md): ResNet-101, f16 (bf16 on TPU),
# large-batch data-parallel training with the experimental 3-keypoint
# head (reference net.py:309-313 'trivial_pose' + urso.py keypoint
# encode) — the first convergence evidence for the keypoint head and
# the resnet101 train step.
#
# Single-chip run uses the same mesh-parameterized program as the
# multi-chip path (DP over 'data' axis; multi-chip numerics verified on
# the 8-device CPU mesh, tests/test_parallel.py + dryrun_multichip).
#
# Usage: bash tools/run_config5_keypoints.sh [epochs] [resume]
set -e
cd "$(dirname "$0")/.."

EPOCHS="${1:-10}"
WEIGHTS="none"
[ "$2" = "resume" ] && WEIGHTS="last"

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

python pose_estimator.py train \
  --dataset soyuz_synth --data_dir "$DS" --weights "$WEIGHTS" \
  --backbone resnet101 --regress_keypoints --f16 \
  --image_scale 0.25 --batch_size 64 --learn_rate 0.004 \
  --epochs "$EPOCHS" --steps_per_epoch 1000 \
  --logs /tmp/kp101_logs --keep_checkpoints 2

# held-out evaluation (SVD keypoint decode -> ESA)
python pose_estimator.py evaluate --dataset soyuz_synth --data_dir "$DS" \
  --backbone resnet101 --regress_keypoints --f16 \
  --image_scale 0.25 --weights last --logs /tmp/kp101_logs \
  --eval_batch 32 --out_dir /tmp/kp101_logs
