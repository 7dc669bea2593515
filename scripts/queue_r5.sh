#!/bin/bash
# Round-5 TPU run queue (one process owns the chip at a time; keep host light
# while chunked/host feeds run). Logs under .convergence/.
cd /root/repo
set -x
{
  # 1. The Q-FCOS-objective counterfactual (VERDICT ask #1)
  STALL_LIMIT_S=2700 python scripts/train_convergence.py FCOS-consistent \
    --eval-every=3000 2>&1 | tail -40
  # 2. PFPNetR full-contract + long legs (ask #5)
  STALL_LIMIT_S=2700 python scripts/train_convergence.py PFPNetR-pad60 \
    --eval-every=2000 2>&1 | tail -30
  STALL_LIMIT_S=2700 python scripts/train_convergence.py PFPNetR-long \
    --eval-every=4000 2>&1 | tail -30
  # 3. LH-RCNN at the reference bs32 contract, 24k steps, mAP curve (ask #4)
  STALL_LIMIT_S=2700 python scripts/train_convergence.py LHRCNN-long2 \
    --eval-every=3000 2>&1 | tail -40
} > .convergence/queue_r5.log 2>&1
echo DONE >> .convergence/queue_r5.log
