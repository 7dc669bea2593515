"""60-second hardware smoke for the Pallas batched-NMS kernel: run it on the real
TPU against the pure-XLA greedy NMS on random boxes and assert identical
selections. Exercises the early-exit while_loop formulation on Mosaic."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpudet.ops import nms
from tpudet.ops.pallas.nms_kernel import batched_greedy_nms_pallas


def main():
    assert jax.default_backend() != "cpu", "needs the TPU"
    rng = np.random.default_rng(0)
    b, n, cap = 8, 1000, 64
    yx = rng.uniform(0, 280, (b, n, 2))
    hw = rng.uniform(8, 60, (b, n, 2))
    boxes = np.concatenate([yx - hw / 2, yx + hw / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    num_sel = rng.integers(3, cap, (b,)).astype(np.int32)

    sel_p, val_p = jax.device_get(batched_greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(num_sel), cap, 0.5))
    sel_x, val_x = jax.device_get(jax.vmap(
        lambda bx, s, ns: nms.greedy_nms(bx, s, cap, 0.5, num_select=ns)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(num_sel)))

    np.testing.assert_array_equal(val_p, val_x)
    np.testing.assert_array_equal(np.where(val_p, sel_p, 0),
                                  np.where(val_x, sel_x, 0))
    # timing: early exit should make cost track num_select, not the static cap
    import time

    small = jnp.asarray(np.full((b,), 8, np.int32))
    for ns, tag in [(jnp.asarray(num_sel), "dyn"), (small, "n=8")]:
        r = batched_greedy_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                      ns, cap, 0.5)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = batched_greedy_nms_pallas(jnp.asarray(boxes),
                                          jnp.asarray(scores), ns, cap, 0.5)
        float(jnp.sum(r[0]))  # scalar fetch syncs through the tunnel
        print(f"  {tag}: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms/call")
    print("PALLAS_SMOKE_OK")


if __name__ == "__main__":
    main()
