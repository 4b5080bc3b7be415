#!/bin/bash
# Chip-pipeline continuation: waits for the w0.5 FLOP-cut gate to
# finish (tools/after_flagship.sh writes /tmp/gate_w05.log), then runs
# the round-5 probe/gate queue that needs the exclusive chip:
#   1. same-process serving A/B at the pruned widths (VERDICT r4 #2):
#      stem/host-s2d/bf16-stem/s8join ablations at w0.5 + w0.25 + base
#   2. the w0.25 variant through the same accuracy gate
# Logs: /tmp/ab_w.log, /tmp/gate_w025.log, decisions in /tmp/after_gate.log
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/after_gate.log

while ! grep -q "GATE PIPELINE DONE" /tmp/gate_w05.log 2>/dev/null; do
  sleep 60
done
echo "[afterg] w0.5 gate pipeline done $(date -u)" >> "$LOG"

echo "[afterg] serving A/B at pruned widths" >> "$LOG"
python tools/ab_serving.py --batch 128 --iters 16 --rounds 4 \
  --variants base,w50,w50+host_s2d,w50+bf16_stem,w50+s8join,w25 \
  > /tmp/ab_w.log 2>&1
echo "[afterg] ab_serving rc=$? $(date -u)" >> "$LOG"

echo "[afterg] w0.25 accuracy gate" >> "$LOG"
bash tools/run_flop_cut_gate.sh 8 skipfull 0.25 > /tmp/gate_w025.log 2>&1
echo "[afterg] w0.25 gate rc=$? $(date -u)" >> "$LOG"
echo "[afterg] queue done $(date -u)" >> "$LOG"
