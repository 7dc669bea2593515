"""Hardware smoke for BOTH Pallas kernels vs their XLA formulations.

Runs the batched assignment kernel (ops/pallas/assign_kernel.py) and the
pre-top-k mining NMS (ops/pallas/nms_kernel.py) on the real TPU at training
shapes and asserts bit-identical results against the vmapped XLA paths
(TPUDET_ASSIGN_IMPL / TPUDET_NMS_IMPL escape hatches). Seconds of chip time;
run before queueing convergence runs that depend on the kernels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tpudet.ops import matching, nms

    rng = np.random.default_rng(0)
    b, g, a = 32, 60, 8828

    gt = -np.ones((b, g, 5), np.float32)
    for i in range(b):
        for k in range(rng.integers(1, 12)):
            h = rng.uniform(8, 200); w = rng.uniform(8, 200)
            gt[i, k] = [rng.uniform(h / 2, 300 - h / 2),
                        rng.uniform(w / 2, 300 - w / 2), h, w,
                        rng.integers(0, 20)]
    yx = rng.uniform(0, 300, (a, 2)).astype(np.float32)
    hw = rng.uniform(8, 150, (a, 2)).astype(np.float32)
    ay1, ay2 = jnp.asarray(yx - hw / 2), jnp.asarray(yx + hw / 2)
    gt = jnp.asarray(gt)
    gy1, gy2 = (gt[..., 0:2] - gt[..., 2:4] / 2, gt[..., 0:2] + gt[..., 2:4] / 2)
    gv = jax.vmap(lambda t: jnp.arange(t.shape[0], dtype=jnp.int32)
                  < matching.valid_gt_count(t))(gt)

    # ------------------------------------------------ assignment kernel
    t0 = time.time()
    os.environ["TPUDET_ASSIGN_IMPL"] = "pallas"
    got = jax.jit(matching.assign_batch)(gy1, gy2, gv, ay1, ay2)
    got = jax.tree.map(np.asarray, got)
    os.environ["TPUDET_ASSIGN_IMPL"] = "xla"
    want = jax.jit(matching.assign_batch)(gy1, gy2, gv, ay1, ay2)
    want = jax.tree.map(np.asarray, want)
    os.environ.pop("TPUDET_ASSIGN_IMPL")
    for name, gv_, wv_ in zip(matching.Assignment._fields, got, want):
        np.testing.assert_array_equal(gv_, wv_, err_msg=name)
    print(f"assign kernel: bit-exact vs XLA at [B={b}, G={g}, A={a}] "
          f"({time.time()-t0:.1f}s incl. compile)", flush=True)

    # ------------------------------------------------ gather_gt_rows exactness
    # The one-hot MXU gather must be EXACT on hardware (Precision.HIGHEST —
    # default matmul precision truncates f32 to bf16 and rounds pixel coords).
    t0 = time.time()
    rg = jnp.asarray(rng.integers(0, g, (a,)).astype(np.int32))
    coord_tab = jnp.asarray(rng.uniform(0, 1200, (g, 4)).astype(np.float32))
    label_tab = jnp.asarray(rng.integers(0, 1000, (g,)).astype(np.int32))
    os.environ["TPUDET_GT_GATHER"] = "onehot"
    got = jax.jit(matching.gather_gt_rows)(rg, coord_tab, label_tab)
    got = jax.tree.map(np.asarray, got)
    os.environ["TPUDET_GT_GATHER"] = "take"
    want = jax.jit(matching.gather_gt_rows)(rg, coord_tab, label_tab)
    want = jax.tree.map(np.asarray, want)
    os.environ.pop("TPUDET_GT_GATHER")
    np.testing.assert_array_equal(got[0], want[0], err_msg="gather coords")
    np.testing.assert_array_equal(got[1], want[1], err_msg="gather labels")
    print(f"gather_gt_rows: onehot == take bit-exact at [A={a}, G={g}] "
          f"({time.time()-t0:.1f}s incl. compile)", flush=True)

    # ------------------------------------------------ pre-top-k mining NMS
    t0 = time.time()
    boxes = jnp.concatenate([ay1, ay2], -1)
    scores = rng.uniform(0, 1, (b, a)).astype(np.float32)
    active = rng.uniform(size=(b, a)) < 0.3
    scores_m = jnp.asarray(np.where(active, scores, -1e30).astype(np.float32))
    ns = jnp.asarray(rng.integers(0, 200, (b,)).astype(np.int32))
    os.environ["TPUDET_NMS_IMPL"] = "pallas"
    got = nms.batched_greedy_nms(boxes, scores_m, ns, 384, 0.7)
    got = jax.tree.map(np.asarray, got)
    os.environ["TPUDET_NMS_IMPL"] = "xla"
    want = nms.batched_greedy_nms(boxes, scores_m, ns, 384, 0.7)
    want = jax.tree.map(np.asarray, want)
    os.environ.pop("TPUDET_NMS_IMPL")
    # compare the SEMANTIC output: valid masks exactly, selections only at valid
    # slots (the XLA loop leaves repeated-garbage indices at invalid slots, the
    # kernels write 0 — every caller masks by `valid`)
    np.testing.assert_array_equal(got[1], want[1], err_msg="valid")
    np.testing.assert_array_equal(np.where(got[1], got[0], 0),
                                  np.where(want[1], want[0], 0), err_msg="sel")
    print(f"pre-top-k NMS: bit-exact vs XLA at [B={b}, N={a}] "
          f"({time.time()-t0:.1f}s incl. compile)", flush=True)

    # quick timing (steady state, scalar-fetch sync)
    os.environ["TPUDET_ASSIGN_IMPL"] = "pallas"
    f_assign = jax.jit(matching.assign_batch)
    f_assign(gy1, gy2, gv, ay1, ay2)
    r = None
    t0 = time.time()
    for _ in range(20):
        r = f_assign(gy1, gy2, gv, ay1, ay2)
    float(jnp.sum(r.best_iou))
    print(f"assign kernel steady: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)
    os.environ.pop("TPUDET_ASSIGN_IMPL")

    os.environ["TPUDET_NMS_IMPL"] = "pallas"
    f_nms = jax.jit(lambda *args: nms.batched_greedy_nms(*args, 384, 0.7))
    f_nms(boxes, scores_m, ns)
    t0 = time.time()
    for _ in range(20):
        r = f_nms(boxes, scores_m, ns)
    float(jnp.sum(r[0]))
    print(f"pre-top-k NMS steady: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)
    os.environ.pop("TPUDET_NMS_IMPL")
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
