"""Measure host->device transfer latency/bandwidth through the axon tunnel, and
whether device_put overlaps with compute — to diagnose the end-to-end vs
device-only step-rate gap seen in the convergence runs (~250 ms/step fixed)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("backend:", jax.default_backend(), dev)

# --- raw device_put cost at several sizes (uint8) ---
for mb in (0.1, 1, 8.6, 32):
    n = int(mb * 1e6)
    x = np.ones(n, np.uint8)
    # warmup
    y = jax.device_put(x, dev); float(jnp.sum(y[:8]))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = jax.device_put(x, dev)
    t_put = (time.perf_counter() - t0) / reps
    float(jnp.sum(y[:8]))
    t_sync = (time.perf_counter() - t0) / reps
    print(f"size {mb:6.1f} MB: device_put returns in {t_put*1e3:8.2f} ms, "
          f"synced {t_sync*1e3:8.2f} ms -> {mb/t_sync:7.1f} MB/s")

# --- does transfer overlap with compute? ---
# compute ~70ms of matmuls while a transfer is in flight
k = jax.random.PRNGKey(0)
a = jax.device_put(jax.random.normal(k, (8192, 8192), jnp.bfloat16), dev)


@jax.jit
def burn(a):
    for _ in range(12):
        a = a @ a / 90.0
    return a


burn(a); float(jnp.sum(burn(a)[0, :2]))  # compile+warm
x = np.ones(int(8.6e6), np.uint8)

t0 = time.perf_counter()
r = burn(a)
float(jnp.sum(r[0, :2]))
t_burn = time.perf_counter() - t0

t0 = time.perf_counter()
y = jax.device_put(x, dev)
r = burn(a)
float(jnp.sum(r[0, :2]))
float(jnp.sum(y[:8]))
t_both = time.perf_counter() - t0
print(f"burn alone {t_burn*1e3:.1f} ms; put(8.6MB)+burn {t_both*1e3:.1f} ms "
      f"(overlap={'YES' if t_both < t_burn * 1.3 else 'NO'})")

# --- per-call dispatch latency (tiny op round trip) ---
s = jax.device_put(np.float32(1.0), dev)
f = jax.jit(lambda v: v + 1)
f(s); float(f(s))
t0 = time.perf_counter()
for _ in range(20):
    float(f(s))
print(f"tiny dispatch+fetch RTT: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
