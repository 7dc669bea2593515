#!/bin/bash
# Round-5 TPU run queue (one process owns the chip at a time; keep host light
# while chunked/host feeds run). Log: .convergence/queue_r5.log
cd /root/repo
{
  set -x
  # 1. PFPNetR full-contract + long legs (VERDICT ask #5)
  STALL_LIMIT_S=2700 python scripts/train_convergence.py PFPNetR-pad60 \
    --eval-every=2000
  STALL_LIMIT_S=2700 python scripts/train_convergence.py PFPNetR-long \
    --eval-every=4000
  # 2. LH-RCNN at the reference bs32 contract: HBM smoke first (the bs32
  # activations + einsum-crop intermediates + chunk residency must coexist),
  # then the 24k-step leg with the mAP curve (ask #4)
  STALL_LIMIT_S=2700 python scripts/train_convergence.py LHRCNN-long2 --smoke
  STALL_LIMIT_S=2700 python scripts/train_convergence.py LHRCNN-long2 \
    --eval-every=3000
} > .convergence/queue_r5.log 2>&1
echo DONE >> .convergence/queue_r5.log
