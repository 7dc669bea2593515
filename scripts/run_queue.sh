#!/bin/bash
# Convergence queue with per-model process isolation: a TPU worker crash in one
# model run cannot poison the following runs (the round-1 queue lost 5 models to
# one in-process fault). Usage: scripts/run_queue.sh MODEL [MODEL...]
cd "$(dirname "$0")/.."
LOG=.convergence/queue3.log
for m in "$@"; do
  echo "=== $(date -u +%H:%M:%S) starting $m ===" | tee -a "$LOG"
  timeout 7200 python scripts/train_convergence.py "$m" >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) $m exited rc=$? ===" | tee -a "$LOG"
done
echo "=== queue done ===" | tee -a "$LOG"
