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


def profile_lhrcnn(spec, n=10, warmup=3):
    """LHRCNN has a custom _compile (two-stage lax.cond loss, no
    _loss_from_outputs) — mirror its forward_losses stage by stage so the
    8.1%-MFU step gets a real phase breakdown (round-4 ADVICE + VERDICT #3):

        fwd        trunk apply (backbone + rpn heads + thin feature)
        +rpn       fwd + rpn matching/sampling loss (both NMS passes)
        +rcnn      fwd + rpn sampling + RoI crop + dense head + rcnn loss
        grad@rpn   value_and_grad of the full loss with is_rpn=True
        grad@rcnn  ... with is_rpn=False
        step       the production jitted train step
    """
    import jax
    import jax.numpy as jnp
    from tpudet.models.lhrcnn import LHRCNN, LHRCNNNet
    from tpudet.heads import lhrcnn as lh
    from tpudet.models.base import global_l2
    from tpudet.ops import losses as loss_ops

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
    print(f"=== LHRCNN (batch {batch} @ {h}x{w}) building...", flush=True)
    model = LHRCNN(spec["config"], provider)
    dimages, dgt = model._to_device(images, gt)
    net, wd = model.net, model.weight_decay
    anc = model.anchors
    c_total = model.num_classes
    sample_weight = model._sample_weight()

    def fwd(params, bstats, imgs):
        x = model._preprocess(imgs.astype(jnp.float32))
        return net.apply({"params": params, "batch_stats": bstats}, x, True,
                         mutable=["batch_stats"])

    def rpn_part(params, bstats, imgs, g):
        (rpn_conf, rpn_loc, rcnn_feat), mut = fwd(params, bstats, imgs)
        pyx, phw, pconf = model._split_rpn(rpn_conf, rpn_loc)
        sample = lh.rpn_loss_and_sample(pyx, phw, pconf, anc, g)
        rpn_loss = loss_ops.weighted_mean(sample.rpn_loss, sample_weight)
        return rpn_loss, (sample, rcnn_feat, mut)

    def full_loss(params, bstats, imgs, g, is_rpn):
        rpn_loss, (sample, rcnn_feat, mut) = rpn_part(params, bstats, imgs, g)

        def roi_fn(feats):
            return net.apply({"params": params, "batch_stats": bstats}, feats,
                             method=LHRCNNNet.roi_head)

        rcnn_loss = lh.rcnn_losses(roi_fn, rcnn_feat.astype(jnp.float32), sample,
                                   float(h), float(w), c_total,
                                   sample_weight=sample_weight)
        rpn_total = rpn_loss + wd * global_l2({"fe": params["feature_extractor"],
                                               "rpn": params["rpn"]})
        rcnn_total = rcnn_loss + wd * global_l2(params["rcnn"])
        loss = jax.lax.cond(is_rpn, lambda: rpn_total, lambda: rcnn_total)
        return loss, mut["batch_stats"]

    jfwd = jax.jit(lambda p, b, i: fwd(p, b, i)[0])
    jrpn = jax.jit(lambda p, b, i, g: rpn_part(p, b, i, g)[0])
    jfull = jax.jit(lambda p, b, i, g, r: full_loss(p, b, i, g, r)[0])
    jgrad = jax.jit(lambda p, b, i, g, r: jax.value_and_grad(
        full_loss, has_aux=True)(p, b, i, g, r))  # all outputs live

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

    p, b = model.params, model.batch_stats
    t_fwd = timeit("fwd", lambda: jfwd(p, b, dimages))
    t_rpn = timeit("+rpn", lambda: jrpn(p, b, dimages, dgt))
    t_full = timeit("+rcnn", lambda: jfull(p, b, dimages, dgt, jnp.bool_(False)))
    t_gr = timeit("grad@rpn", lambda: jgrad(p, b, dimages, dgt, jnp.bool_(True)))
    t_gc = timeit("grad@rcnn", lambda: jgrad(p, b, dimages, dgt, jnp.bool_(False)))
    state = [model.params, model.batch_stats, model.opt_state]

    def full_step():
        out = model._train_step(state[0], state[1], state[2], dimages, dgt,
                                jnp.float32(1e-3), jnp.int32(0))
        state[0], state[1], state[2], loss = out
        return loss

    t_step = timeit("step", full_step)
    print(f"  deltas: rpn-sample {1e3*(t_rpn-t_fwd):.2f} ms | roi+rcnn "
          f"{1e3*(t_full-t_rpn):.2f} ms | bwd@rpn {1e3*(t_gr-t_full):.2f} ms | "
          f"bwd@rcnn {1e3*(t_gc-t_full):.2f} ms | step-over-grad "
          f"{1e3*(t_step-t_gc):.2f} ms", flush=True)


def main():
    names = sys.argv[1:] or ["YOLOv2"]
    specs = _specs()
    for name in names:
        try:
            if name == "LHRCNN":
                profile_lhrcnn(specs[name])
            else:
                profile_model(name, specs[name])
        except Exception as e:
            print(f"  {name} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
