#!/bin/bash
# Round-4 TPU queue, part 3 — launched after queue12's RefineDet320-pad60 leg
# in place of its tail. FCOS-long showed lr 1e-3 was the limiter (loss still
# falling at 15k; reference trains at 1e-2) — FCOS-long2 retries at the
# reference lr and takes priority over the weak-#3 long runs.
cd "$(dirname "$0")/.."
LOG=.convergence/queue13.log
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

conv FCOS-long2 7200
# if long2 diverged (no result, loss NaN in curve), fall back to 3e-3
if [ ! -f .convergence/runs/FCOS-long2/result.json ]; then
  conv FCOS-long3 7200
fi
conv RefineDet320-long 10800
conv LHRCNN-long 10800
echo "=== queue13 done ===" >> "$LOG"
