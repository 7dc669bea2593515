#!/bin/bash
# Post-convergence TPU session: RefineDet worker-crash bisect matrix, SSD profile
# with the early-exit NMS kernel, and the headline bench. One TPU user at a time.
cd "$(dirname "$0")/.."
LOG=.convergence/post_queue4.log
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" >> "$LOG"
  timeout 900 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}
export BISECT_STEPS=40
run python scripts/bisect_refinedet.py                       # host feed, no aug, pallas
run python scripts/bisect_refinedet.py --device-augment      # + device augment
run python scripts/bisect_refinedet.py --device-augment --xla-nms
run python scripts/bisect_refinedet.py --xla-nms
run python scripts/profile_ssd.py
run python bench.py
echo "=== post_queue4 done ===" >> "$LOG"
