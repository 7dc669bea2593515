#!/bin/bash
# Post-convergence TPU session: RefineDet worker-crash bisect matrix, SSD profile
# with the early-exit NMS kernel, and the headline bench. One TPU user at a time.
#
# Crash hypothesis (from the queue4 failure pattern): Pallas mining-NMS kernel
# inside the one-dispatch lax.scan epoch. Models with scan but no Pallas NMS
# (YOLO/CenterNet) and with Pallas NMS but host feed (LHRCNN) all run clean;
# RefineDet/PFPNetR (scan + Pallas NMS) kill the TPU worker within ~5 steps.
# Matrix ordered least->most crash-prone so a wedged backend doesn't mask rows;
# probe() waits for the TPU to answer again after a worker crash.
cd "$(dirname "$0")/.."
LOG=.convergence/post_queue4.log
probe() {
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
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" >> "$LOG"
  timeout 900 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
  probe
}
export BISECT_STEPS=40
run python scripts/bisect_refinedet.py                       # host feed, no aug, pallas
run python scripts/bisect_refinedet.py --device-augment      # + device augment
run python scripts/bisect_refinedet.py --device-augment --xla-nms
run python scripts/bisect_refinedet.py --device-augment --device-dataset --scan --xla-nms  # scan w/o pallas
run python scripts/bisect_refinedet.py --device-augment --device-dataset     # DeviceDataset, no scan
run python scripts/bisect_refinedet.py --device-augment --device-dataset --scan  # exact crashed config
run python scripts/profile_ssd.py
run python bench.py
echo "=== post_queue4 done ===" >> "$LOG"
