"""Micro-timings for the SSD loss block's constituent ops on the real TPU.

The assignment+NMS-ablated SSD300 loss still costs ~11.5 ms (profile_ssd2,
queue8) against ~0.3 ms of theoretical HBM traffic — this isolates which op
class burns it: the [B,A]-from-[B,G] gathers (suspected serialized lowering),
the [B,A,C] log-softmax, the [B,A] elementwise mass, or dispatch overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

B, G, A, C = 32, 60, 8828, 21
rng = np.random.default_rng(0)
rg = jnp.asarray(rng.integers(0, G, (B, A)).astype(np.int32))
table = jnp.asarray(rng.uniform(0, 300, (B, G, 2)).astype(np.float32))
label = jnp.asarray(rng.integers(0, C, (B, G)).astype(np.int32))
conf = jnp.asarray(rng.normal(size=(B, A, C)).astype(np.float32))
ba = jnp.asarray(rng.integers(0, A, (B, G)).astype(np.int32))


def timeit(name, fn, *args, n=20):
    fn(*args)
    out = None
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    print(f"{name:46s} {(time.time()-t0)/n*1e3:8.3f} ms", flush=True)


@jax.jit
def gather_rows(rg, table):  # g.yx[rg] pattern: [B, A, 2] from [B, G, 2]
    return jax.vmap(lambda r, t: t[r])(rg, table)


@jax.jit
def gather_rows_onehot(rg, table):  # same via one-hot matmul on the MXU
    oh = (rg[..., None] == jnp.arange(G, dtype=jnp.int32)).astype(jnp.float32)
    return jnp.einsum("bag,bgc->bac", oh, table)


@jax.jit
def gather_label(rg, label):  # g.label[rg]: [B, A] int from [B, G]
    return jax.vmap(lambda r, t: t[r])(rg, label)


@jax.jit
def gather_conf_rows(ba, conf):  # pconf[best_anchor]: [B, G, C] from [B, A, C]
    return jax.vmap(lambda i, c: c[i])(ba, conf)


@jax.jit
def logsoftmax(conf):
    return jax.nn.log_softmax(conf, -1)


@jax.jit
def elementwise_mass(conf):  # ~10 passes over [B, A] f32
    x = conf[..., 0]
    for _ in range(10):
        x = jnp.where(x > 0, x * 0.5, x + 1.0)
    return jnp.sum(x)


@jax.jit
def noop(rg):
    return rg + 1


timeit("noop [B, A] int32 (dispatch floor)", noop, rg)
timeit("gather [B,A,2] rows from [B,G,2]", gather_rows, rg, table)
timeit("same via one-hot MXU matmul", gather_rows_onehot, rg, table)
timeit("gather [B,A] labels from [B,G]", gather_label, rg, label)
timeit("gather [B,G,C] conf rows from [B,A,C]", gather_conf_rows, ba, conf)
timeit("log_softmax [B,A,C]", logsoftmax, conf)
timeit("10x elementwise pass over [B,A]", elementwise_mass, conf)

# ---------------------------------------------------- mining-NMS split
# the "-NMS" ablation delta was 6.7 ms (profile_ssd2); is it the lax.top_k
# pre-pool, the greedy kernel, or the index plumbing?
from tpudet.ops import nms as nms_mod
from tpudet.ops.pallas import nms_kernel

scores = jnp.asarray(
    np.where(rng.uniform(size=(B, A)) < 0.3,
             rng.uniform(0, 10, (B, A)), -1e30).astype(np.float32))
boxes = jnp.asarray(
    np.concatenate([p := rng.uniform(0, 280, (A, 2)).astype(np.float32),
                    p + rng.uniform(5, 40, (A, 2)).astype(np.float32)], -1))
ns = jnp.asarray(rng.integers(5, 120, (B,)).astype(np.int32))
CAP = 384
POOL = max(2 * CAP, 512)


@jax.jit
def topk_only(s):
    return jax.lax.top_k(s, POOL)


@jax.jit
def mining_full(bx, s, n):
    return nms_kernel.batched_greedy_nms_pretopk(bx, s, n, CAP, 0.7)


pool_s, pool_i = jax.jit(topk_only)(scores)
pool_b = boxes[pool_i]


@jax.jit
def kernel_only(bx, s, n):
    return nms_kernel.batched_greedy_nms_pallas(bx, s, n, CAP, 0.7)


timeit(f"lax.top_k [B,{A}] -> {POOL}", topk_only, scores)
timeit(f"greedy kernel on pooled [B,{POOL}]", kernel_only, pool_b, pool_s, ns)
timeit("mining pre-top-k full path", mining_full, boxes, scores, ns)
