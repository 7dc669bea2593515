#!/bin/bash
# Second RefineDet crash bisect round: the first round established the trigger is
# data-dependent (synthvoc data crashes via host feed AND device-dataset, with
# Pallas AND XLA NMS; random-noise data always passes). This round splits the data
# delta: gt-pad shape (24 vs 60), gt content, image content.
cd "$(dirname "$0")/.."
LOG=.convergence/bisect2.log
probe() {
  for i in $(seq 1 30); do
    if timeout 120 python -c "import jax; jax.numpy.zeros((8,8)).sum().block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "=== probe $i failed; waiting ===" >> "$LOG"
    sleep 20
  done
  return 1
}
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" >> "$LOG"
  BISECT_STEPS=60 timeout 900 python scripts/bisect_refinedet.py "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
  probe
}
run --device-augment --pad60                               # shape control
run --device-augment --synthvoc --gt-only --pad60          # real gt, noise images
run --device-augment --synthvoc --images-only --pad60      # real images, noise gt
echo "=== bisect2 done ===" >> "$LOG"
