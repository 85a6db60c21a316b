#!/bin/bash
# Stall-watchdog retry runner for flaky-TPU-worker jobs: the axon worker
# sporadically hangs during Mosaic/XLA compiles (see docs/STATUS.md
# "Environment incident"); completed compiles are banked in the JAX
# compilation cache, so kill-and-retry makes monotonic progress.
# usage: run_retry.sh LOGFILE MAX_RETRIES STALL_SECONDS CMD...
LOG=$1; RETRIES=$2; STALL=$3; shift 3
touch "$LOG"
for i in $(seq 0 "$RETRIES"); do
  [ "$i" -gt 0 ] && echo "RETRY ($i)" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALL" ]; then
      echo "[watchdog] no output for ${AGE}s - killing pid $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; RC=$?
  [ "$RC" -eq 0 ] && exit 0
done
exit 1
