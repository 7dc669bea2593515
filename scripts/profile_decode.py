"""Decompose p50 single-image inference latency on the real TPU.

Round-4 VERDICT weak #2: YOLOv3 218 / LHRCNN 258 / RetinaNet 273 / FCOS 278 ms
p50 vs the ~52 ms SSD300 floor. This script splits test_one_image into:

    transfer    host->device image put (the tunnel's fixed cost)
    forward     net.apply alone (batch 1, eval mode)
    decode      _decode_outputs on PRE-COMPUTED head tensors (jit'd separately)
    full        the production fused infer jit (forward+decode, one fetch)

Deltas localize whether the tail is the tunnel, the backbone, or the decode/NMS
program. Usage: python scripts/profile_decode.py [Model ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench_all import _specs


def profile_decode(name, spec, n=15, warmup=3):
    import jax
    import jax.numpy as jnp
    from tpudet import models as model_zoo

    cls = model_zoo.ALL_MODELS[name]
    h, w = spec["shape"]
    cfg = dict(spec["config"])
    cfg["mode"] = "test"
    print(f"=== {name} (test @ {h}x{w}) building...", flush=True)
    model = cls(cfg, None)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)

    def timeit(label, fn, sync):
        for _ in range(warmup):
            sync(fn())
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            sync(fn())
            times.append(time.perf_counter() - t0)
        p50 = float(np.percentile(times, 50)) * 1e3
        print(f"  {label:10s} {p50:8.2f} ms", flush=True)
        return p50

    # 1. transfer: device_put + a trivial on-device reduce fetched back
    jsum = jax.jit(lambda x: jnp.sum(x))
    timeit("transfer", lambda: jsum(jnp.asarray(img)), lambda o: float(o))

    # 2. forward only (eval mode)
    net = model.net
    dimg = jnp.asarray(img)

    def fwd():
        x = model._preprocess(dimg.astype(jnp.float32))
        return net.apply({"params": model.params,
                          "batch_stats": model.batch_stats}, x, False)

    jfwd = jax.jit(fwd)

    def sync_tree(o):
        return float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))

    timeit("forward", jfwd, sync_tree)

    # 3. decode only, on the cached forward outputs (device-resident inputs).
    # LHRCNN has a bespoke _build_infer (two-stage RoI decode) and no
    # _decode_outputs; for it decode ~= fused - forward.
    pre_topk = model._base_pre_topk

    def sync_dec(o):
        return float(jnp.sum(o[0].astype(jnp.float32)))

    try:
        outputs = jfwd()
        jdec = jax.jit(lambda out: model._decode_outputs(out, pre_topk))
        timeit("decode", lambda: jdec(outputs), sync_dec)
    except NotImplementedError:
        print("  decode     (custom infer; see fused - forward)", flush=True)

    # 4. the fused production program on a device-resident image (no transfer)
    jinfer = model._infer_at(pre_topk)
    timeit("fused", lambda: jinfer(model.params, model.batch_stats, dimg),
           sync_dec)

    # 5. the production path (np contiguous copy + transfer + fetch-all)
    timeit("full", lambda: model.test_one_image(img), lambda o: None)


def main():
    names = sys.argv[1:] or ["RetinaNet", "YOLOv3", "FCOS", "LHRCNN", "SSD300"]
    specs = _specs()
    for name in names:
        try:
            profile_decode(name, specs[name])
        except Exception:
            import traceback

            traceback.print_exc()


if __name__ == "__main__":
    main()
