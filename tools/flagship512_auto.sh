#!/bin/bash
# Auto-resuming launcher for the flagship 512x640 convergence run:
# picks --weights last iff a checkpoint already exists, so the same
# command works for the first attempt and for babysit_train.sh restarts.
# Usage: flagship512_auto.sh [epochs] [extra-args...]
set -e
cd "$(dirname "$0")/.."
EPOCHS="${1:-60}"
shift 2>/dev/null || true
if ls /tmp/flagship512_logs/*/weights_*.msgpack >/dev/null 2>&1; then
  exec bash tools/run_flagship512.sh "$EPOCHS" resume "$@"
else
  exec bash tools/run_flagship512.sh "$EPOCHS" none "$@"
fi
