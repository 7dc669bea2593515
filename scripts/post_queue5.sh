#!/bin/bash
# Round-3 post-convergence TPU session: deep SSD profile ablations (VERDICT task
# 4), the pad-60 split-dispatch probe (task 5), and the full per-model benchmark
# regeneration with the new MFU column (weak #3). One TPU user at a time — this is
# chained after the convergence queue by a watcher on /tmp/queue5.pid.
cd "$(dirname "$0")/.."
LOG=.convergence/post_queue5.log
probe() {
  for i in $(seq 1 30); do
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
  echo "=== rc=$? ===" >> "$LOG"
}
T=900 run python scripts/smoke_pallas_tpu.py   # new cross-batch NMS kernel on hardware
T=1800 run python scripts/profile_ssd2.py
# pad-60 + device-augment, augment split into its own dispatch (the fused-program
# fault workaround): 60-step smoke, then a longer soak if the smoke passes
T=900 BISECT_STEPS=60 run python scripts/bisect_refinedet.py --device-augment --pad60 --split
if tail -5 "$LOG" | grep -q "rc=0"; then
  T=1800 BISECT_STEPS=300 run python scripts/bisect_refinedet.py --device-augment --pad60 --split
fi
T=5400 run python scripts/bench_all.py SSD300 SSD512 YOLOv2 YOLOv3 RetinaNet RefineDet320 PFPNetR LHRCNN CenterNet FCOS
T=900 run python bench.py
echo "=== post_queue5 done ===" >> "$LOG"
