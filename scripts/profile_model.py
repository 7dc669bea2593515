"""Generic per-model train-step phase profiler on the real TPU.

Splits a model's train step into forward / +loss / +backward / +optimizer by
timing nested jits (each phase includes the previous ones; the deltas localize
the cost):

    fwd        net.apply alone (train-mode BN, mutable batch_stats)
    fwd+loss   the exact forward_loss of DetectorBase._compile (augment unless
               split-dispatch, preprocess, net, family loss, weight decay)
    grad       value_and_grad(forward_loss)
    step       model._train_step (grad + optimizer update, donated buffers)

Usage: python scripts/profile_model.py [Model ...]   (default YOLOv2)

Timing methodology follows bench_all.py: a device->host scalar fetch after the
timed loop is the reliable sync through the axon tunnel (block_until_ready is
not). Specs are bench_all's reference-config table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench_all import _specs


def profile_model(name, spec, n=10, warmup=3):
    import jax
    import jax.numpy as jnp
    from tpudet import models as model_zoo

    cls = model_zoo.ALL_MODELS[name]
    h, w = spec["shape"]
    batch = spec["batch"]
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32)
    gt = -np.ones((batch, 60, 5), np.float32)
    gt[:, 0] = [h * 0.5, w * 0.5, h * 0.3, w * 0.25, 7]
    gt[:, 1] = [h * 0.2, w * 0.7, h * 0.15, w * 0.2, 2]

    def batches():
        while True:
            yield images, gt

    provider = {"data_shape": [h, w, 3], "num_train": batch * 10**9,
                "num_val": 0, "train_generator": (lambda: None, batches()),
                "val_generator": None}
    print(f"=== {name} (batch {batch} @ {h}x{w}) building...", flush=True)
    model = cls(spec["config"], provider)
    dimages, dgt = model._to_device(images, gt)
    lr = jnp.float32(1e-3)
    step0 = jnp.int32(0)

    net, wd = model.net, model.weight_decay
    sample_weight = model._sample_weight()
    from tpudet.models.base import global_l2

    augment_fused = not getattr(model, "_augment_split", False)

    def fwd(params, bstats, imgs, s):
        x = imgs.astype(jnp.float32)
        if augment_fused:
            x, _ = model._device_augment(x, dgt, s)
        x = model._preprocess(x)
        return net.apply({"params": params, "batch_stats": bstats}, x, True,
                         mutable=["batch_stats"])

    def forward_loss(params, bstats, imgs, g, s):
        x = imgs.astype(jnp.float32)
        if augment_fused:
            x, g = model._device_augment(x, g, s)
        x = model._preprocess(x)
        outputs, mut = net.apply({"params": params, "batch_stats": bstats}, x,
                                 True, mutable=["batch_stats"])
        loss = model._loss_from_outputs(outputs, g, sample_weight)
        return loss + wd * global_l2(params), mut["batch_stats"]

    jfwd = jax.jit(fwd)
    jfl = jax.jit(lambda p, b, i, g, s: forward_loss(p, b, i, g, s)[0])
    # the grads MUST be jit outputs: returning only the loss lets XLA dead-code
    # -eliminate the whole transpose, timing 'grad' == 'fwd+loss' (round-4
    # ADVICE finding). sync() fetches one scalar; completion of the dispatched
    # program covers every output.
    jgrad = jax.jit(
        lambda p, b, i, g, s: jax.value_and_grad(forward_loss, has_aux=True)(
            p, b, i, g, s))  # ((loss, aux), grads) — all live

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf).astype(jnp.float32)) if leaf.ndim else float(leaf)

    def timeit(label, fn):
        out = None
        for _ in range(warmup):
            out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / n
        print(f"  {label:12s} {dt*1e3:8.2f} ms  {batch/dt:8.1f} imgs/s",
              flush=True)
        return dt

    t_fwd = timeit("fwd", lambda: jfwd(model.params, model.batch_stats,
                                       dimages, step0))
    t_fl = timeit("fwd+loss", lambda: jfl(model.params, model.batch_stats,
                                          dimages, dgt, step0))
    t_gr = timeit("grad", lambda: jgrad(model.params, model.batch_stats,
                                        dimages, dgt, step0))
    # full step: donation invalidates inputs, so thread the state like bench_all
    state = [model.params, model.batch_stats, model.opt_state]

    def full():
        out = model._train_step(state[0], state[1], state[2], dimages, dgt, lr,
                                step0)
        state[0], state[1], state[2], loss = out
        return loss

    t_step = timeit("step", full)
    print(f"  deltas: loss {1e3*(t_fl-t_fwd):.2f} ms | bwd "
          f"{1e3*(t_gr-t_fl):.2f} ms | opt {1e3*(t_step-t_gr):.2f} ms",
          flush=True)


def main():
    names = sys.argv[1:] or ["YOLOv2"]
    specs = _specs()
    for name in names:
        try:
            profile_model(name, specs[name])
        except Exception as e:
            print(f"  {name} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
