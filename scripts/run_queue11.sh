#!/bin/bash
# Round-4 TPU queue — boundary-safe ordering (round-3 VERDICT weak #7):
# every cheap, high-information item runs BEFORE any multi-hour training run,
# and all training runs write artifacts incrementally (curve.jsonl + periodic
# ckpt), so a boundary cut costs minutes, not the deliverable.
#
#   1. XLA flag sweep (bench A/B, ~20 min)     — informs the perf push
#   2. FCOS-long        (chunked feed, ~1h)    — the last convergence hole
#   3. RetinaNet-long   (~1h)                  — slipped two rounds
#   4. RefineDet320-pad60 (5k steps, ~1h)      — full reference data contract
#   5. RefineDet320-long (~40 min)             — undertrained-row check
#   6. LHRCNN-long      (chunked feed, ~1.5h)  — undertrained-row check
#   7. bench refresh
cd "$(dirname "$0")/.."
LOG=.convergence/queue11.log
probe() {
  for i in $(seq 1 45); do
    if timeout 180 python - <<'PYEOF' >/dev/null 2>&1
import jax
jax.numpy.zeros((8, 8)).sum().block_until_ready()
PYEOF
    then return 0; fi
    echo "=== probe $i failed; waiting for TPU recovery ===" >> "$LOG"
    sleep 20
  done
  return 1
}
run() {
  probe
  echo "=== $(date -u +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) rc=$? ===" >> "$LOG"
}
conv() {
  T=${2:-14400} run python scripts/train_convergence.py "$1"
  if [ ! -f ".convergence/runs/$1/result.json" ] \
     && [ -f ".convergence/runs/$1/ckpt_meta.json" ]; then
    T=7200 run python scripts/train_convergence.py "$1" --resume
  fi
  if [ ! -f ".convergence/runs/$1/result.json" ] \
     && [ -f ".convergence/runs/$1/ckpt_meta.json" ]; then
    T=3600 run python scripts/train_convergence.py "$1" --eval-only
  fi
}

T=1200 run python scripts/micro_loss.py
T=3600 run python scripts/sweep_flags.py

conv FCOS-long
# RetinaNet-long: landed by the still-running queue10 (round-3 tail); rerun
# here only if its result never materialized
if [ ! -f .convergence/runs/RetinaNet-long/result.json ]; then
  conv RetinaNet-long
fi
conv RefineDet320-pad60 7200
conv RefineDet320-long
conv LHRCNN-long

T=1200 run python bench.py
echo "=== queue11 done ===" >> "$LOG"
