#!/bin/bash
# Round-3 restructured TPU session (replaces the queue5 + post_queue5 chain):
#   1. perf measurement FIRST (Pallas smoke, deep SSD profile incl. the
#      gather-lowering A/B, bench.py) so optimization data lands early;
#   2. the three empty-mAP convergence rows (PFPNetR, FCOS, RefineDet320 —
#      round-2 VERDICT missing #1), then CenterNet-long (weak #2);
#   3. the pad-60 split-dispatch probe (task 5);
#   4. BENCH_DETAILS regeneration with the MFU column (weak #3);
#   5. RetinaNet-long last (lowest marginal value if the round ends first).
# Runs stalled out by a wedged tunnel exit via the watchdog (rc=93) and are
# salvaged from their periodic checkpoint with --eval-only.
cd "$(dirname "$0")/.."
LOG=.convergence/queue6.log
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

T=900 run python scripts/smoke_pallas_tpu.py
T=2700 run python scripts/profile_ssd2.py
T=1200 run python bench.py

conv PFPNetR
conv FCOS
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
echo "=== queue6 done ===" >> "$LOG"
