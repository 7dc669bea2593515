#!/bin/bash
# Round-3 TPU queue, take 4 (post-boundary): kernels already hardware-smoked interactively;
#   1. hardware smoke of both Pallas kernels (bit-exactness on the real chip)
#      BEFORE anything depends on them;
#   2. profile_ssd2 with the new assignment ablations + bench.py (perf data);
#   3. the remaining empty-mAP convergence rows (FCOS, RefineDet320 —
#      PFPNetR ran in queue7), then CenterNet-long;
#   4. the pad-60 split-dispatch probe;
#   5. BENCH_DETAILS regeneration (per-model MFU) + bench;
#   6. RetinaNet-long last (lowest marginal value if the round ends first).
cd "$(dirname "$0")/.."
LOG=.convergence/queue9.log
probe() {
  for i in $(seq 1 45); do
    if timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax
jax.numpy.zeros((8, 8)).sum().block_until_ready()
EOF
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
conv() {  # one convergence run + checkpoint-salvage eval if it stalled/died
  T=14400 run python scripts/train_convergence.py "$1"
  if [ ! -f ".convergence/runs/$1/result.json" ] \
     && [ -f ".convergence/runs/$1/ckpt_meta.json" ]; then
    T=3600 run python scripts/train_convergence.py "$1" --eval-only
  fi
}

conv RefineDet320
conv CenterNet-long

# pad-60 + device-augment with the augment split into its own dispatch (the
# fused-program fault workaround): 60-step smoke, then a longer soak
T=900 BISECT_STEPS=60 run python scripts/bisect_refinedet.py --device-augment --pad60 --split
if tail -5 "$LOG" | grep -q "rc=0"; then
  T=1800 BISECT_STEPS=300 run python scripts/bisect_refinedet.py --device-augment --pad60 --split
fi

T=7200 run python scripts/bench_all.py SSD300 SSD512 YOLOv2 YOLOv3 RetinaNet RefineDet320 PFPNetR LHRCNN CenterNet FCOS
T=1200 run python bench.py

conv RetinaNet-long
echo "=== queue9 done ===" >> "$LOG"
