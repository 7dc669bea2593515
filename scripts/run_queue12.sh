#!/bin/bash
# Round-4 TPU queue, part 2 — the convergence legs, highest-information first
# (round-3 VERDICT next-round items #1, #3, #5). micro_loss + the XLA flag
# sweep + the conf-layout bench A/B already ran interactively (queue11's cheap
# prefix); this queue is only the multi-hour runs, each writing artifacts
# incrementally (curve.jsonl + periodic ckpt) so a boundary cut costs minutes.
#
#   1. FCOS-long           (~40 min at the chunked-feed rate) — last convergence hole
#   2. RefineDet320-pad60  (~1h)  — full reference data contract (missing #3)
#   3. RefineDet320-long   (~2h)  — undertrained-row check
#   4. LHRCNN-long         (~2h)  — undertrained-row check (may be boundary-cut;
#                                   resume-able next round)
cd "$(dirname "$0")/.."
LOG=.convergence/queue12.log
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

conv FCOS-long 7200
conv RefineDet320-pad60 7200
conv RefineDet320-long 10800
conv LHRCNN-long 10800
echo "=== queue12 done ===" >> "$LOG"
