#!/bin/bash
# Round-3 TPU queue, take 5: post-boundary remainder after the interactive
# window (FCOS --resume + XLA flag sweep ran by hand). CenterNet-long, the
# pad-60 split-dispatch probe, BENCH_DETAILS regeneration, RetinaNet-long.
cd "$(dirname "$0")/.."
LOG=.convergence/queue10.log
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
  T=14400 run python scripts/train_convergence.py "$1"
  if [ ! -f ".convergence/runs/$1/result.json" ] \
     && [ -f ".convergence/runs/$1/ckpt_meta.json" ]; then
    T=7200 run python scripts/train_convergence.py "$1" --resume
  fi
  if [ ! -f ".convergence/runs/$1/result.json" ] \
     && [ -f ".convergence/runs/$1/ckpt_meta.json" ]; then
    T=3600 run python scripts/train_convergence.py "$1" --eval-only
  fi
}

conv CenterNet-long

T=900 BISECT_STEPS=60 run python scripts/bisect_refinedet.py --device-augment --pad60 --split
if tail -5 "$LOG" | grep -q "rc=0"; then
  T=1800 BISECT_STEPS=300 run python scripts/bisect_refinedet.py --device-augment --pad60 --split
fi

T=7200 run python scripts/bench_all.py SSD300 SSD512 YOLOv2 YOLOv3 RetinaNet RefineDet320 PFPNetR LHRCNN CenterNet FCOS
T=1200 run python bench.py

conv RetinaNet-long
echo "=== queue10 done ===" >> "$LOG"
