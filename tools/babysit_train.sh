#!/bin/bash
# Stall-watchdog wrapper for long TPU-tunnel training runs.
#
# The remote-tunnel transport occasionally wedges a device RPC: the
# training process sleeps on a futex forever while the chip sits idle
# (observed twice during the flagship 512x640 run — PERF.md). Training
# is already exactly resumable (--weights last restores params +
# optimizer state + epoch counter from state_latest.msgpack), so the
# robust recovery is: watch the run's metrics.jsonl mtime, and when no
# epoch completes inside the stall window, kill the wedged process and
# relaunch it with --weights last.
#
# Usage: babysit_train.sh <metrics_glob_dir> <stall_seconds> <done_marker> -- <train cmd ...>
#   The train command MUST contain '--weights last' (or be a script that
#   resumes itself). Exits when the train command exits 0.
set -u
LOGDIR="$1"; STALL="$2"; DONE="$3"; shift 3
[ "$1" = "--" ] && shift

attempt=0
while true; do
  attempt=$((attempt + 1))
  echo "[babysit] attempt $attempt: $*" >&2
  "$@" &
  PID=$!
  START=$(date +%s)
  echo $PID > "${DONE}.pid"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    M=$(ls -t "$LOGDIR"/*/metrics.jsonl 2>/dev/null | head -1)
    if [ -n "${M:-}" ]; then
      # A resumed run appends to the previous run dir's metrics.jsonl,
      # whose mtime predates this attempt — measure staleness from the
      # later of (last epoch write, this attempt's start) so a fresh
      # launch gets the full window to compile + finish its first epoch.
      LAST=$(stat -c %Y "$M")
      [ "$LAST" -lt "$START" ] && LAST=$START
      AGE=$(( $(date +%s) - LAST ))
      if [ "$AGE" -gt "$STALL" ]; then
        echo "[babysit] stall: $M is ${AGE}s old (> ${STALL}s); killing $PID" >&2
        kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
        break
      fi
    fi
  done
  wait "$PID"; RC=$?
  if [ "$RC" -eq 0 ]; then
    echo "[babysit] train command exited 0 — done" >&2
    touch "$DONE"
    exit 0
  fi
  echo "[babysit] train exited rc=$RC; restarting in 15s" >&2
  sleep 15
done
