#!/bin/bash
# Convergence queue with per-model process isolation: a TPU worker crash in one
# model run cannot poison the following runs (the round-1 queue lost 5 models to
# one in-process fault). Usage: scripts/run_queue.sh MODEL [MODEL...]
cd "$(dirname "$0")/.."
LOG=${QUEUE_LOG:-.convergence/queue3.log}
probe() {
  # wait for the tunneled TPU worker to answer again after a crash, so one
  # model's fault doesn't surface as FAILED_PRECONDITION in the next run
  for i in $(seq 1 30); do
    if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
jax.numpy.zeros((8, 8)).sum().block_until_ready()
EOF
    then return 0; fi
    echo "=== probe $i failed; waiting for TPU recovery ===" >> "$LOG"
    sleep 20
  done
  return 1
}
for m in "$@"; do
  probe  # wait for a healthy worker BEFORE each run (a wedged backend after a
         # prior crash surfaces as FAILED_PRECONDITION in the next build)
  echo "=== $(date -u +%H:%M:%S) starting $m ===" | tee -a "$LOG"
  timeout 14400 python scripts/train_convergence.py "$m" >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) $m exited rc=$? ===" | tee -a "$LOG"
done
echo "=== queue done ===" | tee -a "$LOG"
