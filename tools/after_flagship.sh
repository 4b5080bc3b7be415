#!/bin/bash
# Post-flagship-convergence automation: waits for the babysat training
# run to finish (/tmp/flagship512.done), evaluates the full flagship
# (float + production int8 combo), then either launches the w0.5
# FLOP-cut gate (decoded float ESA good enough) or resumes training for
# another block of epochs. Keeps the exclusive chip busy unattended;
# every decision is logged to /tmp/after_flagship.log.
#
# Usage: bash tools/after_flagship.sh [esa_gate=0.125] [resume_epochs=84]
set -u
cd "$(dirname "$0")/.."
GATE="${1:-0.125}"
RESUME_TO="${2:-84}"
LOG=/tmp/after_flagship.log

while [ ! -f /tmp/flagship512.done ]; do sleep 60; done
echo "[after] training done marker seen $(date -u)" >> "$LOG"

DS=/tmp/cls24_ds
EVAL_BASE="python pose_estimator.py evaluate --dataset soyuz_synth \
  --data_dir $DS --backbone resnet50 --classify_ori --ori_resolution 24 \
  --bottleneck 128 --image_scale 0.5 --eval_batch 32 \
  --weights last --logs /tmp/flagship512_logs --out_dir /tmp/flagship512_logs"

echo "[after] full flagship float eval" >> "$LOG"
$EVAL_BASE > /tmp/eval_full_float.log 2>&1
ESA=$(grep -oP 'ESA score:\s+\K[0-9.]+' /tmp/eval_full_float.log | tail -1)
echo "[after] float ESA = ${ESA:-parse-failed}" >> "$LOG"

echo "[after] full flagship int8 (production combo) eval" >> "$LOG"
$EVAL_BASE --int8 > /tmp/eval_full_int8.log 2>&1
ESA8=$(grep -oP 'ESA score:\s+\K[0-9.]+' /tmp/eval_full_int8.log | tail -1)
echo "[after] int8 ESA = ${ESA8:-parse-failed}" >> "$LOG"

GOOD=$(python -c "print(1 if float('${ESA:-9}') <= float('$GATE') else 0)")
if [ "$GOOD" = "1" ]; then
  echo "[after] ESA $ESA <= $GATE: launching w0.5 FLOP-cut gate" >> "$LOG"
  bash tools/run_flop_cut_gate.sh 10 skipfull 0.5 \
    > /tmp/gate_w05.log 2>&1
  echo "[after] w0.5 gate pipeline rc=$? $(date -u)" >> "$LOG"
else
  echo "[after] ESA $ESA > $GATE: resuming training to $RESUME_TO epochs" \
    >> "$LOG"
  rm -f /tmp/flagship512.done
  nohup bash tools/babysit_train.sh /tmp/flagship512_logs 1800 \
    /tmp/flagship512.done -- bash tools/flagship512_auto.sh "$RESUME_TO" \
    >> /tmp/flagship512_run.log 2>&1 &
  echo $! > /tmp/babysit.pid
fi
echo "[after] done $(date -u)" >> "$LOG"
