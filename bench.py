"""Benchmark: SSD300 data-parallel train-step throughput on the default backend (TPU).

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": "images/sec/chip", "vs_baseline": R}

The reference publishes no numbers (BASELINE.md); its north star is ">=10x images/sec/
chip over the TF1 CPU baseline". The baseline is the ACTUAL reference SSD300.py TF1
graph run on this host's CPU (minimally patched per SURVEY.md Q1; measured by
scripts/measure_reference_baseline.py, cached in BASELINE_CPU.json as
``reference_tf1_cpu_imgs_per_sec``; this framework's own CPU rate is the fallback).
``vs_baseline = tpu_imgs_per_sec / (10 * cpu_imgs_per_sec)`` — i.e. >= 1.0 means the
10x north-star is met.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

BATCH = int(os.environ.get("BENCH_BATCH", 32))
STEPS = int(os.environ.get("BENCH_STEPS", 30))  # 30 amortizes the ~24 ms tunnel
# fetch + per-dispatch overhead to <1 ms/step; 10 understated steady-state ~3%
CPU_BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")


def _build_model(batch, platform=None, compute_dtype="bfloat16"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    from tpudet.models.ssd import SSD300

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (batch, 300, 300, 3)).astype(np.float32)
    gt = -np.ones((batch, 60, 5), np.float32)
    gt[:, 0] = [150, 150, 120, 90, 7]
    gt[:, 1] = [60, 200, 50, 70, 2]

    def batches():
        while True:
            yield images, gt

    config = {
        "mode": "train",
        "data_format": "channels_last",
        "num_classes": 20,
        "weight_decay": 1e-4,
        "keep_prob": 1.0,
        "batch_size": batch,
        "nms_score_threshold": 0.5,
        "nms_max_boxes": 20,
        "nms_iou_threshold": 0.5,
        "pretraining_weight": None,
        "compute_dtype": compute_dtype,
    }
    provider = {
        "data_shape": [300, 300, 3],
        "num_train": batch * 10**9,
        "num_val": 0,
        "train_generator": (lambda: None, batches()),
        "val_generator": None,
    }
    return SSD300(config, provider), images, gt


def _time_steps(model, images, gt, steps, warmup=2):
    import jax.numpy as jnp

    dimages, dgt = model._to_device(images, gt)
    lr, step = jnp.float32(0.001), jnp.int32(0)
    for _ in range(warmup):
        model.params, model.batch_stats, model.opt_state, loss = model._train_step(
            model.params, model.batch_stats, model.opt_state, dimages, dgt, lr, step
        )
    float(loss)  # scalar fetch: jax.block_until_ready does not truly block through
    # the axon tunnel, so sync on a device->host value instead
    t0 = time.perf_counter()
    for _ in range(steps):
        model.params, model.batch_stats, model.opt_state, loss = model._train_step(
            model.params, model.batch_stats, model.opt_state, dimages, dgt, lr, step
        )
    float(loss)  # donation serializes the chain; fetching the last loss syncs all
    dt = time.perf_counter() - t0
    return images.shape[0] * steps / dt


def _cpu_baseline():
    if os.path.exists(CPU_BASELINE_FILE):
        with open(CPU_BASELINE_FILE) as f:
            blob = json.load(f)
        # prefer the measured TF1 reference; fall back to our own CPU rate
        return blob.get("reference_tf1_cpu_imgs_per_sec") or blob.get("cpu_imgs_per_sec")
    # measure in a subprocess so the CPU platform choice doesn't leak
    import subprocess
    import sys

    code = (
        "import bench, json;"
        "m, i, g = bench._build_model(2, platform='cpu', compute_dtype='float32');"
        "v = bench._time_steps(m, i, g, steps=2, warmup=1);"
        "print('CPURESULT', json.dumps(v))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3000, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPURESULT"):
                v = float(json.loads(line.split(" ", 1)[1]))
                with open(CPU_BASELINE_FILE, "w") as f:
                    json.dump({"cpu_imgs_per_sec": v,
                               "note": "tpudet SSD300 f32 train step, batch 2, 1 CPU core"}, f)
                return v
    except Exception:
        pass
    return None


def _time_scan(model, images, gt, steps):
    """The framework's real epoch loop: ``steps`` train steps in ONE lax.scan
    dispatch over a device-resident batch (DetectorBase._train_scan — the path
    convergence runs use with the HBM-resident dataset)."""
    import jax.numpy as jnp

    dimages, dgt = model._to_device(images, gt)
    idx = jnp.zeros((steps, images.shape[0]), jnp.int32) + jnp.arange(
        images.shape[0], dtype=jnp.int32)[None]
    fn = model._train_scan(steps)
    lr, step0 = jnp.float32(0.001), jnp.int32(0)
    out = fn(model.params, model.batch_stats, model.opt_state,
             dimages, dgt, idx, lr, step0)  # warm (compile)
    model.params, model.batch_stats, model.opt_state, losses = out
    float(losses[-1])
    t0 = time.perf_counter()
    out = fn(model.params, model.batch_stats, model.opt_state,
             dimages, dgt, idx, lr, step0)
    model.params, model.batch_stats, model.opt_state, losses = out
    float(losses[-1])
    dt = time.perf_counter() - t0
    return images.shape[0] * steps / dt


def main():
    model, images, gt = _build_model(BATCH)
    tpu_rate = _time_steps(model, images, gt, STEPS)
    try:
        scan_rate = _time_scan(model, images, gt, max(STEPS, 20))
    except Exception:
        # visible failure: the scan path is the one convergence runs use
        import traceback

        traceback.print_exc()
        scan_rate = None
    cpu_rate = _cpu_baseline()
    vs = (tpu_rate / (10.0 * cpu_rate)) if cpu_rate else None
    print(json.dumps({
        "metric": "ssd300_train_imgs_per_sec_per_chip_bs%d_bf16" % BATCH,
        "value": round(tpu_rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "scan_epoch_imgs_per_sec": round(scan_rate, 2) if scan_rate else None,
    }))


if __name__ == "__main__":
    main()
