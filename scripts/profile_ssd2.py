"""Deeper SSD300 train-step ablations on the real TPU (round-2 VERDICT task 4).

profile_ssd.py localized the step to fwd 18.4 / matching+CE 9.9 / mining NMS 4.9 /
bwd+opt 37.6 ms. This script splits those further to pick optimization targets:

  * forward in eval-BN vs train-BN mode (batch-stat reduction cost);
  * gradient of the net alone vs gradient of net+loss (loss-bwd cost);
  * the loss as its own dispatch on precomputed head tensors, then with the IoU
    matrix / best-mask scatter / encode ablated one at a time;
  * optimizer update alone (momentum + weight-decay L2);
  * XLA cost_analysis bytes -> rough achieved HBM bandwidth per phase.

Timing methodology: scalar fetch per dispatch (BASELINE.md note — block_until_ready
does not fully sync through the axon tunnel).
"""
import os
import sys
import time
from functools import partial

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
gt = -np.ones((B, 60, 5), np.float32)
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
    leaf = jax.tree.leaves(outs)[0]
    float(jnp.sum(leaf).astype(jnp.float32)) if leaf.ndim else float(leaf)
    t0 = time.time()
    for _ in range(n):
        outs = fn(*args)
    leaf = jax.tree.leaves(outs)[0]
    float(jnp.sum(leaf).astype(jnp.float32)) if leaf.ndim else float(leaf)
    dt = (time.time() - t0) / n
    print(f"{name:40s} {dt*1e3:8.2f} ms  {B/dt:8.1f} imgs/s", flush=True)
    return dt


def preprocess(x):
    return model._preprocess(x.astype(jnp.float32))


# ---------------------------------------------------------------- forward modes
@jax.jit
def fwd_eval(params, bstats, x):
    return net.apply({"params": params, "batch_stats": bstats}, preprocess(x), False)


@jax.jit
def fwd_train(params, bstats, x):
    outs, mut = net.apply({"params": params, "batch_stats": bstats}, preprocess(x),
                          True, mutable=["batch_stats"])
    return outs


# ---------------------------------------------------------------- backward split
@jax.jit
def grad_net_only(params, bstats, x):
    def f(p):
        outs, _ = net.apply({"params": p, "batch_stats": bstats}, preprocess(x),
                            True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(outs))
    return jax.grad(f)(params)


@jax.jit
def grad_full(params, bstats, x, g):
    def f(p):
        outs, _ = net.apply({"params": p, "batch_stats": bstats}, preprocess(x),
                            True, mutable=["batch_stats"])
        return model._loss_from_outputs(outs, g, None)
    return jax.grad(f)(params)


# ---------------------------------------------------------------- loss-only
with jax.default_device(jax.devices()[0]):
    head_outs = fwd_eval(params, bstats, dev_images)
head_outs = jax.tree.map(lambda a: a + 0, head_outs)

from tpudet.heads import ssd as ssd_head  # noqa: E402
from tpudet.ops import matching, nms as nms_mod  # noqa: E402


@jax.jit
def loss_only(outs, g):
    return model._loss_from_outputs(outs, g, None)


def _make_ablated(ablate):
    from unittest import mock

    def fake_iou(g, y1x1, y2x2):
        gn = g.yx.shape[0]
        return jnp.broadcast_to(
            (jnp.arange(y1x1.shape[0]) % 17).astype(jnp.float32) / 20.0,
            (gn, y1x1.shape[0]))

    def fake_scatter(best_anchor, valid, a):
        return jnp.zeros((a,), bool)

    def fake_assign(gy1, gy2, gv, ay1, ay2):
        b, g = gv.shape
        a = ay1.shape[-2]
        return matching.Assignment(
            jnp.zeros((b, g), jnp.int32),
            jnp.broadcast_to((jnp.arange(a) % 17).astype(jnp.float32) / 20.0,
                             (b, a)),
            jnp.zeros((b, a), jnp.int32),
            jnp.zeros((b, a), bool))

    def fake_nms(boxes, scores, num_select, max_out, iou_threshold, active=None):
        b = scores.shape[0]
        idx = jnp.broadcast_to(jnp.arange(max_out, dtype=jnp.int32)[None],
                               (b, max_out))
        return idx, idx < num_select[:, None]

    patches = []
    if "iou" in ablate:
        patches.append(mock.patch.object(matching, "masked_iou_matrix", fake_iou))
    if "scatter" in ablate:
        patches.append(mock.patch.object(matching, "scatter_best_mask",
                                         fake_scatter))
    if "assign" in ablate:
        patches.append(mock.patch.object(matching, "assign_batch", fake_assign))
    if "nms" in ablate:
        patches.append(mock.patch.object(nms_mod, "batched_greedy_nms", fake_nms))

    @jax.jit
    def fn(outs, g):
        for p in patches:
            p.start()
        try:
            return model._loss_from_outputs(outs, g, None)
        finally:
            for p in patches:
                p.stop()

    return fn


# ---------------------------------------------------------------- optimizer only
grads0 = grad_full(params, bstats, dev_images, dev_gt)
grads0 = jax.tree.map(lambda a: a + 0, grads0)


@jax.jit
def opt_only(p, o, g):
    loss_w = model.weight_decay * __import__(
        "tpudet.models.base", fromlist=["global_l2"]).global_l2(p)
    new_p, new_o = model._optimizer.update(g, o, p, jnp.float32(1e-3))
    return new_p, new_o, loss_w


t_fe = timeit("forward (eval BN)", fwd_eval, params, bstats, dev_images)
t_ft = timeit("forward (train BN)", fwd_train, params, bstats, dev_images)
t_gn = timeit("grad net-only", grad_net_only, params, bstats, dev_images)
t_gf = timeit("grad net+loss", grad_full, params, bstats, dev_images, dev_gt)
t_l = timeit("loss only", loss_only, head_outs, dev_gt)
t_ln = timeit("loss only (mining NMS ablated)", _make_ablated(("nms",)),
              head_outs, dev_gt)
t_li = timeit("loss only (NMS+IoU ablated)", _make_ablated(("nms", "iou")),
              head_outs, dev_gt)
t_ls = timeit("loss only (NMS+scatter ablated)", _make_ablated(("nms", "scatter")),
              head_outs, dev_gt)
t_la = timeit("loss only (all ablated)", _make_ablated(("nms", "iou", "scatter")),
              head_outs, dev_gt)
t_lassign = timeit("loss only (assign ablated)", _make_ablated(("assign",)),
                   head_outs, dev_gt)
t_lan = timeit("loss only (assign+NMS ablated)",
               _make_ablated(("assign", "nms")), head_outs, dev_gt)
o2 = jax.tree.map(lambda a: a + 0, model.opt_state)
t_o = timeit("optimizer update + wd L2", opt_only, params, o2, grads0)

print(f"\ntrain-BN stats overhead   {1e3*(t_ft - t_fe):6.2f} ms", flush=True)
print(f"net bwd (no loss)          {1e3*(t_gn - t_ft):6.2f} ms", flush=True)
print(f"loss fwd+bwd in grad       {1e3*(t_gf - t_gn):6.2f} ms", flush=True)
print(f"loss breakdown: total {1e3*t_l:.2f} | -NMS {1e3*t_ln:.2f} | "
      f"-NMS-IoU {1e3*t_li:.2f} | -NMS-scatter {1e3*t_ls:.2f} | "
      f"-all {1e3*t_la:.2f}", flush=True)

# ------------------------------------------------- assignment-impl A/B
# the Pallas assignment kernel vs the vmapped XLA formulation, loss and full grad
for impl in ("pallas", "xla"):
    os.environ["TPUDET_ASSIGN_IMPL"] = impl

    @jax.jit
    def loss_ab(outs, g):
        return model._loss_from_outputs(outs, g, None)

    @jax.jit
    def grad_ab(params, bstats, x, g):
        def f(p):
            outs, _ = net.apply({"params": p, "batch_stats": bstats},
                                preprocess(x), True, mutable=["batch_stats"])
            return model._loss_from_outputs(outs, g, None)
        return jax.grad(f)(params)

    timeit(f"loss only [assign={impl}]", loss_ab, head_outs, dev_gt)
    timeit(f"grad net+loss [assign={impl}]", grad_ab, params, bstats,
           dev_images, dev_gt)
os.environ.pop("TPUDET_ASSIGN_IMPL", None)

for name, fn, args in [("fwd_eval", fwd_eval, (params, bstats, dev_images)),
                       ("grad_full", grad_full,
                        (params, bstats, dev_images, dev_gt)),
                       ("loss_only", loss_only, (head_outs, dev_gt))]:
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = ca.get("flops", float("nan"))
        by = ca.get("bytes accessed", float("nan"))
        print(f"cost[{name}]: {fl/1e12:.3f} TFLOP, {by/1e9:.2f} GB accessed",
              flush=True)
    except Exception as e:  # cost_analysis availability varies by backend
        print(f"cost[{name}]: unavailable ({e})", flush=True)
