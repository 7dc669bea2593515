"""Component timing breakdown for the SSD300 train step on the real TPU.

Times (per dispatch, warm): backbone-only forward, full forward+loss, grad step,
and the train step without the mining NMS, to localize where the step time goes
before attacking MFU (VERDICT round-1 weak #1). Also reports XLA's FLOP estimate
(cost_analysis) -> achieved TFLOP/s / MFU vs the v5e bf16 peak (~197 TFLOP/s).

Timing uses a scalar fetch per dispatch (block_until_ready does not fully sync
through the axon tunnel — BASELINE.md methodology note).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpudet.models.ssd import SSD300

B = int(os.environ.get("PROF_BATCH", 32))
H = W = 300
PEAK = 197e12

rng = np.random.default_rng(0)
images = rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)
gt = -np.ones((B, 24, 5), np.float32)
for b in range(B):
    for k in range(3):
        h = rng.uniform(20, 200); w = rng.uniform(20, 200)
        gt[b, k] = [rng.uniform(h/2, H-h/2), rng.uniform(w/2, W-w/2), h, w,
                    rng.integers(0, 20)]


def batches():
    while True:
        yield images, gt


cfg = {"mode": "train", "data_format": "channels_last", "num_classes": 20,
       "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": B,
       "nms_score_threshold": 0.05, "nms_max_boxes": 40,
       "nms_iou_threshold": 0.45, "pretraining_weight": None,
       "compute_dtype": "bfloat16", "input_dtype": "uint8"}
provider = {"data_shape": [H, W, 3], "num_train": B, "num_val": 0,
            "train_generator": batches(), "val_generator": None}
print("building...", flush=True)
model = SSD300(cfg, provider)
net = model.net
params, bstats = model.params, model.batch_stats
dev_images = jnp.asarray(images)
dev_gt = jnp.asarray(gt)


def timeit(name, fn, *args, n=12, warmup=3):
    outs = None
    for _ in range(warmup):
        outs = fn(*args)
    # sync: fetch one scalar from the output tree
    leaf = jax.tree.leaves(outs)[0]
    float(jnp.sum(leaf).astype(jnp.float32)) if leaf.ndim else float(leaf)
    t0 = time.time()
    for _ in range(n):
        outs = fn(*args)
    leaf = jax.tree.leaves(outs)[0]
    float(jnp.sum(leaf).astype(jnp.float32)) if leaf.ndim else float(leaf)
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt*1e3:8.2f} ms  {B/dt:8.1f} imgs/s", flush=True)
    return dt


# 1. forward only (backbone+heads)
@jax.jit
def fwd(params, bstats, x):
    x = model._preprocess(x.astype(jnp.float32))
    return net.apply({"params": params, "batch_stats": bstats}, x, False)


# 2. forward + loss (no grad)
@jax.jit
def fwd_loss(params, bstats, x, g):
    x = model._preprocess(x.astype(jnp.float32))
    outs, _ = net.apply({"params": params, "batch_stats": bstats}, x, True,
                        mutable=["batch_stats"])
    return model._loss_from_outputs(outs, g, None)


# 2b. forward + loss with the mining NMS ablated (selection indices forced
# constant) — attributes the loss overhead between matching/CE and the NMS
@jax.jit
def fwd_loss_nonms(params, bstats, x, g):
    from unittest import mock

    from tpudet.ops import nms as nms_mod

    def fake_nms(boxes, scores, num_select, max_out, iou_threshold, active=None):
        b = scores.shape[0]
        idx = jnp.broadcast_to(jnp.arange(max_out, dtype=jnp.int32)[None], (b, max_out))
        valid = idx < num_select[:, None]
        return idx, valid

    x = model._preprocess(x.astype(jnp.float32))
    outs, _ = net.apply({"params": params, "batch_stats": bstats}, x, True,
                        mutable=["batch_stats"])
    with mock.patch.object(nms_mod, "batched_greedy_nms", fake_nms):
        return model._loss_from_outputs(outs, g, None)


# 3. full train step (value_and_grad + update)  — the model's own compiled step
def full_step(pa, bs, os_, x, g):
    return model._train_step(pa, bs, os_, x, g, jnp.float32(1e-3), jnp.int32(5))


t_fwd = timeit("forward", fwd, params, bstats, dev_images)
t_fl = timeit("forward+loss", fwd_loss, params, bstats, dev_images, dev_gt)
t_fln = timeit("forward+loss (NMS ablated)", fwd_loss_nonms, params, bstats,
               dev_images, dev_gt)

# keep reusable copies: _train_step donates
import copy
p2 = jax.tree.map(lambda x: x + 0, params)
b2 = jax.tree.map(lambda x: x + 0, bstats)
o2 = jax.tree.map(lambda x: x + 0, model.opt_state)
res = None
for _ in range(3):
    res = full_step(jax.tree.map(lambda x: x + 0, p2),
                    jax.tree.map(lambda x: x + 0, b2),
                    jax.tree.map(lambda x: x + 0, o2), dev_images, dev_gt)
float(res[3])
t0 = time.time()
N = 12
for _ in range(N):
    res = full_step(res[0], res[1], res[2], dev_images, dev_gt)
float(res[3])
t_step = (time.time() - t0) / N
print(f"{'train step (donated)':34s} {t_step*1e3:8.2f} ms  {B/t_step:8.1f} imgs/s",
      flush=True)

# FLOP estimate from XLA for the train step
lowered = jax.jit(model._train_step_fn).lower(
    params, bstats, model.opt_state, dev_images, dev_gt, jnp.float32(1e-3),
    jnp.int32(5))
ca = lowered.compile().cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
flops = ca.get("flops", float("nan")) if ca else float("nan")
print(f"XLA flops/step {flops/1e12:.3f} T  -> achieved {flops/t_step/1e12:.1f} "
      f"TFLOP/s = {flops/t_step/PEAK*100:.1f}% MFU", flush=True)
print(f"loss-only overhead  {1e3*(t_fl - t_fwd):6.2f} ms "
      f"(matching/CE {1e3*(t_fln - t_fwd):6.2f} + mining NMS "
      f"{1e3*(t_fl - t_fln):6.2f})", flush=True)
print(f"bwd/opt overhead    {1e3*(t_step - t_fl):6.2f} ms", flush=True)
