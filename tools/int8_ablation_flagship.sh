#!/bin/bash
# int8 PTQ technique ablation on the trained flagship checkpoint
# (round 5): plain PTQ vs smooth-only vs bias-correct-only vs combo.
# The round-4 resnet18@192x256 ablation picked smooth+bias_correct as
# the production combo (+0.13% ESA); the first flagship-shape run of
# that combo measured +41% (PERF.md round 5), so the combo must be
# re-picked from flagship-shape evidence.
#
# Usage: bash tools/int8_ablation_flagship.sh [logdir=/tmp/flagship512_logs] [out=/tmp/int8_ablate]
set -e
cd "$(dirname "$0")/.."
LOGS="${1:-/tmp/flagship512_logs}"
OUT="${2:-/tmp/int8_ablate}"
mkdir -p "$OUT"

EVAL="python pose_estimator.py evaluate --dataset soyuz_synth \
  --data_dir /tmp/cls24_ds --backbone resnet50 --classify_ori \
  --ori_resolution 24 --bottleneck 128 --image_scale 0.5 \
  --eval_batch 32 --weights last --logs $LOGS"

run() {  # name, extra args...
  local name="$1"; shift
  echo "=== int8 ablation: $name ==="
  $EVAL --out_dir "$OUT/$name" --int8 "$@" 2>&1 | tee "$OUT/$name.log" \
    | grep -E "ESA score|int8:" || true
}

# CPU weight-side diagnosis (PERF.md round 5): smooth(0.5) inflates the
# ori_final weight-quant error 3.0x (0.0063->0.0190) — the decode-
# critical logits — via the 150x-spread ori_dense_0/out migration
# group, so smooth is expected to be the damaging half at this shape;
# float_finals tests whether final-dense quantization alone explains
# the plain-PTQ delta.
run plain         --smooth_quant -1 --bias_correct 0
run bias_only     --smooth_quant -1 --bias_correct 1
run combo         --smooth_quant 0.5 --bias_correct 1
run plain_ffinals --smooth_quant -1 --bias_correct 0 --int8_float_finals
run combo_cap16   --smooth_quant 0.5 --smooth_max_spread 16 --bias_correct 1
echo "ABLATION DONE"
grep -H "ESA score" "$OUT"/*.log
