"""Bisect the RefineDet320 TPU worker crash: build the real model, feed random
batches, run a few steps; --xla-nms forces the XLA NMS fallback (monkeypatching
the Pallas path) to isolate whether the Pallas mining kernel is the trigger."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if "--xla-nms" in sys.argv:
    from tpudet.ops.pallas import nms_kernel
    from tpudet.ops import nms as nms_mod

    def _no_pallas(boxes, scores, num_select, max_out, iou_threshold,
                   interpret=False):
        raise RuntimeError("pallas disabled for bisect")

    nms_kernel.batched_greedy_nms_pallas = _no_pallas

    import jax
    import jax.numpy as jnp

    _orig = nms_mod.batched_greedy_nms

    def batched_greedy_nms(boxes, scores, num_select, max_out, iou_threshold,
                           active=None):
        if active is not None:
            scores = jnp.where(active, scores, -1e30)
        boxes = jax.lax.stop_gradient(boxes)
        scores = jax.lax.stop_gradient(scores)
        num_select = jax.lax.stop_gradient(num_select)
        if boxes.ndim == 2:
            return jax.vmap(
                lambda s_, ns_: nms_mod.greedy_nms(boxes, s_, max_out,
                                                   iou_threshold, num_select=ns_)
            )(scores, num_select)
        return jax.vmap(
            lambda b_, s_, ns_: nms_mod.greedy_nms(b_, s_, max_out, iou_threshold,
                                                   num_select=ns_)
        )(boxes, scores, num_select)

    nms_mod.batched_greedy_nms = batched_greedy_nms
    # heads imported it by name
    import tpudet.heads.refine as refine_mod
    import tpudet.heads.ssd as ssd_mod

    refine_mod.nms.batched_greedy_nms = batched_greedy_nms
    ssd_mod.nms.batched_greedy_nms = batched_greedy_nms
    print("XLA NMS fallback forced", flush=True)

from tpudet.models.refinedet import RefineDet320

rng = np.random.default_rng(0)
B, H, W = 32, 320, 320
STEPS = int(os.environ.get("BISECT_STEPS", "30"))
GT_PAD = 60 if "--pad60" in sys.argv else 24


def random_gt():
    gt = -np.ones((B, GT_PAD, 5), np.float32)
    for b in range(B):
        for k in range(rng.integers(1, 6)):
            h = rng.uniform(20, 200)
            w = rng.uniform(20, 200)
            yc = rng.uniform(h / 2, H - h / 2)
            xc = rng.uniform(w / 2, W - w / 2)
            gt[b, k] = [yc, xc, h, w, rng.integers(0, 20)]
    return gt


def batches():
    while True:
        images = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)
        yield images, random_gt()


cfg = {"mode": "train", "data_format": "channels_last", "num_classes": 20,
       "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": B,
       "nms_score_threshold": 0.05, "nms_max_boxes": 40,
       "nms_iou_threshold": 0.45, "pretraining_weight": None,
       "compute_dtype": "bfloat16", "input_dtype": "uint8",
       "input_size": 320, "loss_sync_every": 5, "no_scan_epoch": True}
if "--device-augment" in sys.argv:
    cfg["device_augment"] = {"flip_prob": [0.5, 0.5]}
    print("device_augment on", flush=True)
if "--split" in sys.argv:
    # augmentation as its own dispatch (models/base.py 'device_augment_split'):
    # the fused step + width-60 remap program is the isolated crash trigger
    cfg["device_augment_split"] = True
    print("augment split dispatch on", flush=True)
if "--scan" in sys.argv:
    # the convergence runs' one-dispatch epoch scan (DetectorBase._train_scan);
    # the crashed RefineDet/PFPNetR runs are the only ones combining it with the
    # Pallas mining NMS kernel in the scan body
    cfg.pop("no_scan_epoch", None)
    print("scan epoch on", flush=True)

feed = batches()
if "--synthvoc" in sys.argv or "--device-dataset" in sys.argv:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import synthvoc

    d = synthvoc.build(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".convergence", "data"), H, W)
    train_images, train_gt, _, _ = synthvoc.load(d)
    if "--device-dataset" in sys.argv:
        from tpudet.data.device_dataset import DeviceDataset

        feed = DeviceDataset(train_images, train_gt, B, seed=1,
                             max_bytes=10 * 10**9)
        print("DeviceDataset feed", flush=True)
    else:
        arr_i = np.asarray(train_images[:512])
        arr_g = np.asarray(train_gt[:512])
        use_real_images = "--gt-only" not in sys.argv
        use_real_gt = "--images-only" not in sys.argv

        def synth_batches():
            while True:
                idx = rng.integers(0, arr_i.shape[0], B)
                images = arr_i[idx] if use_real_images else \
                    rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)
                gt = arr_g[idx] if use_real_gt else random_gt()
                yield images, gt

        feed = synth_batches()
        print(f"synthvoc host feed (real_images={use_real_images} "
              f"real_gt={use_real_gt})", flush=True)

provider = {"data_shape": [H, W, 3], "num_train": B * STEPS, "num_val": 0,
            "train_generator": feed, "val_generator": None}
print("building...", flush=True)
model = RefineDet320(cfg, provider)
model.train_initializer = None
print("training...", flush=True)
loss = model.train_one_epoch(5e-4)
print("\nmean loss", loss, flush=True)
