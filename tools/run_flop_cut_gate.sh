#!/bin/bash
# Accuracy gate for the reduced-FLOP serving variant (PERF.md):
#   1. evaluate the trained FULL flagship (float + production int8),
#   2. prune its inner channels to INNER_WIDTH_MULT=<width>
#      (tools/prune_inner.py),
#   3. fine-tune the pruned model briefly at the flagship shape,
#   4. evaluate the pruned model (float + production int8).
# Gate: pruned int8 decoded ESA within 2% of the full-flagship float ESA
# on the held-out split — the same bar the int8 path itself is held to.
#
# Usage: bash tools/run_flop_cut_gate.sh [finetune_epochs] [resume|fresh] [width]
#   width: INNER_WIDTH_MULT of the pruned variant (default 0.5); the
#          fine-tune logs go to /tmp/pruned<width>_logs so several widths
#          can be gated side by side. Pass 'resume' to continue a
#          fine-tune with --weights last; 'skipfull' to skip the full-
#          flagship evals (already recorded by an earlier width's run).
set -e
cd "$(dirname "$0")/.."

FT_EPOCHS="${1:-10}"
MODE="${2:-fresh}"
WIDTH="${3:-0.5}"
DS=/tmp/cls24_ds
LOGS=/tmp/flagship512_logs
PLOGS=/tmp/pruned${WIDTH}_logs

EVAL_BASE="python pose_estimator.py evaluate --dataset soyuz_synth \
  --data_dir $DS --backbone resnet50 --classify_ori --ori_resolution 24 \
  --bottleneck 128 --image_scale 0.5 --eval_batch 32"

if [ "$MODE" = "fresh" ]; then
  echo "=== full flagship: float ==="
  $EVAL_BASE --weights last --logs "$LOGS" --out_dir "$LOGS"
  echo "=== full flagship: int8 (production combo: smooth+bias_correct) ==="
  $EVAL_BASE --weights last --logs "$LOGS" --out_dir "$LOGS" --int8
fi

if [ "$MODE" = "resume" ]; then
  WEIGHTS=last
else
  LAST=$(ls -t "$LOGS"/*/weights_*.msgpack | head -1)
  echo "=== pruning $LAST to INNER_WIDTH_MULT=$WIDTH ==="
  python tools/prune_inner.py "$LAST" /tmp/pruned${WIDTH}.msgpack \
    --mult "$WIDTH"
  WEIGHTS=/tmp/pruned${WIDTH}.msgpack
fi

echo "=== fine-tuning the pruned model ($FT_EPOCHS epochs, w$WIDTH) ==="
python pose_estimator.py train \
  --dataset soyuz_synth --data_dir "$DS" --weights "$WEIGHTS" \
  --backbone resnet50 --classify_ori --ori_resolution 24 \
  --bottleneck 128 \
  --image_scale 0.5 --batch_size 32 --learn_rate 0.002 \
  --rot_aug --rot_image_aug --epochs "$FT_EPOCHS" --steps_per_epoch 1000 \
  --set DATA_ON_DEVICE_MAX_MB=1200 --set INNER_WIDTH_MULT=$WIDTH \
  --logs "$PLOGS" --keep_checkpoints 2

echo "=== pruned w$WIDTH: float ==="
$EVAL_BASE --weights last --logs "$PLOGS" --out_dir "$PLOGS" \
  --set INNER_WIDTH_MULT=$WIDTH
echo "=== pruned w$WIDTH: int8 plain ==="
$EVAL_BASE --weights last --logs "$PLOGS" --out_dir "$PLOGS/int8_plain" \
  --set INNER_WIDTH_MULT=$WIDTH --int8 --smooth_quant -1 --bias_correct 0
echo "=== pruned w$WIDTH: int8 (smooth+bias_correct combo) ==="
$EVAL_BASE --weights last --logs "$PLOGS" --out_dir "$PLOGS/int8_combo" \
  --set INNER_WIDTH_MULT=$WIDTH --int8 --smooth_quant 0.5 --bias_correct 1
echo "GATE PIPELINE DONE (width $WIDTH)"
