"""Per-model TPU benchmarks: train images/sec (reference hyperparams) and p50
single-image inference latency with fully on-device decode/NMS.

Writes BENCH_DETAILS.json at the repo root. Models are benchmarked with their
reference driver batch sizes / input shapes (BASELINE.md table) and bf16 activations.
Run: python scripts/bench_all.py [model ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_DETAILS.json")


def _specs():
    return {
        "SSD300": dict(batch=32, shape=(300, 300), config={
            "mode": "train", "data_format": "channels_last", "num_classes": 20,
            "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": 32,
            "nms_score_threshold": 0.5, "nms_max_boxes": 20,
            "nms_iou_threshold": 0.5, "pretraining_weight": None,
            "compute_dtype": "bfloat16"}),
        "YOLOv3": dict(batch=12, shape=(448, 448), config={
            "mode": "train", "data_shape": [448, 448, 3], "num_classes": 20,
            "weight_decay": 5e-4, "keep_prob": 0.5, "data_format": "channels_last",
            "batch_size": 12, "coord_scale": 1, "noobj_scale": 1, "obj_scale": 5.0,
            "class_scale": 1.0, "num_priors": 3,
            "nms_score_threshold": 0.5, "nms_max_boxes": 10,
            "nms_iou_threshold": 0.5, "compute_dtype": "bfloat16",
            "priors": [[[10.0, 13.0], [16, 30.0], [33.0, 23.0]],
                       [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
                       [[116.0, 90.0], [156.0, 198.0], [373.0, 326.0]]]}),
        "RetinaNet": dict(batch=32, shape=(500, 500), config={
            "is_bottleneck": True, "residual_block_list": [3, 4, 6, 3],
            "init_conv_filters": 16, "mode": "train", "is_pretraining": False,
            "data_shape": [500, 500, 3], "num_classes": 20, "weight_decay": 1e-4,
            "keep_prob": 0.5, "data_format": "channels_last", "batch_size": 32,
            "gamma": 2.0, "alpha": 0.25, "nms_score_threshold": 0.8,
            "nms_max_boxes": 10, "nms_iou_threshold": 0.45,
            "compute_dtype": "bfloat16"}),
        "CenterNet": dict(batch=15, shape=(384, 384), config={
            "mode": "train", "input_size": 384, "data_format": "channels_last",
            "num_classes": 20, "weight_decay": 1e-4, "keep_prob": 0.5,
            "batch_size": 15, "score_threshold": 0.1, "top_k_results_output": 100,
            "compute_dtype": "bfloat16"}),
        "FCOS": dict(batch=8, shape=(800, 1200), config={
            "mode": "train", "data_shape": [800, 1200, 3],
            "data_format": "channels_last", "num_classes": 20,
            "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": 8,
            "nms_score_threshold": 0.5, "nms_max_boxes": 10,
            "nms_iou_threshold": 0.45, "compute_dtype": "bfloat16"}),
        "RefineDet320": dict(batch=32, shape=(320, 320), config={
            "mode": "train", "input_size": 320, "data_format": "channels_last",
            "num_classes": 20, "weight_decay": 1e-4, "keep_prob": 0.5,
            "batch_size": 32, "nms_score_threshold": 0.1, "nms_max_boxes": 20,
            "nms_iou_threshold": 0.45, "pretraining_weight": None,
            "compute_dtype": "bfloat16"}),
        "YOLOv2": dict(batch=32, shape=(480, 480), config={
            "mode": "train", "data_shape": [480, 480, 3], "num_classes": 20,
            "weight_decay": 1e-4, "keep_prob": 0.5, "data_format": "channels_last",
            "batch_size": 32, "coord_scale": 1, "noobj_scale": 1, "obj_scale": 5.0,
            "class_scale": 1.0, "nms_score_threshold": 0.5, "nms_max_boxes": 10,
            "nms_iou_threshold": 0.5, "rescore_confidence": False,
            "priors": [[1.08, 1.19], [3.42, 4.41], [6.63, 11.38], [9.42, 5.11],
                       [16.62, 10.52]], "compute_dtype": "bfloat16"}),
        "PFPNetR": dict(batch=32, shape=(320, 320), config={
            "mode": "train", "input_size": 320, "data_format": "channels_last",
            "num_classes": 20, "weight_decay": 1e-4, "keep_prob": 0.5,
            "batch_size": 32, "nms_score_threshold": 0.1, "nms_max_boxes": 20,
            "nms_iou_threshold": 0.45, "pretraining_weight": None,
            "compute_dtype": "bfloat16"}),
        "LHRCNN": dict(batch=8, shape=(700, 1100), config={
            "data_shape": [700, 1100, 3], "mode": "train", "is_pretraining": False,
            "data_format": "channels_last", "num_classes": 20, "weight_decay": 1e-4,
            "keep_prob": 0.5, "batch_size": 8, "rpn_first_step": 60000,
            "rcnn_first_step": 100000, "rpn_second_step": 160000,
            "nms_score_threshold": 0.5, "nms_max_boxes": 20,
            "nms_iou_threshold": 0.45, "post_nms_proposal": 500,
            "compute_dtype": "bfloat16"}),
        "SSD512": dict(batch=32, shape=(512, 512), config={
            "mode": "train", "data_format": "channels_last", "num_classes": 20,
            "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": 32,
            "nms_score_threshold": 0.5, "nms_max_boxes": 20,
            "nms_iou_threshold": 0.5, "pretraining_weight": None,
            "compute_dtype": "bfloat16"}),
    }


def bench_model(name, spec, train_steps=6, latency_runs=15):
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

    provider = {"data_shape": [h, w, 3], "num_train": batch * 10**9, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    result = {}

    t0 = time.time()
    model = cls(spec["config"], provider)
    dimages, dgt = model._to_device(images, gt)
    lr = jnp.float32(1e-3)
    extra = (jnp.int32(0),)  # the traced global-step arg (device_augment key)
    for _ in range(2):
        out = model._train_step(model.params, model.batch_stats, model.opt_state,
                                dimages, dgt, lr, *extra)
        model.params, model.batch_stats, model.opt_state, loss = out
    float(loss)  # block_until_ready does not truly block through the axon tunnel;
    # a scalar fetch is the reliable sync
    result["compile_plus_warmup_s"] = round(time.time() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(train_steps):
        out = model._train_step(model.params, model.batch_stats, model.opt_state,
                                dimages, dgt, lr, *extra)
        model.params, model.batch_stats, model.opt_state, loss = out
    float(loss)  # donation serializes steps; the last loss syncs the whole chain
    dt = (time.perf_counter() - t0) / train_steps
    result["train_step_ms"] = round(dt * 1000, 1)
    result["train_imgs_per_sec"] = round(batch / dt, 1)
    result["loss_finite"] = bool(np.isfinite(float(loss)))

    # per-model MFU vs the v5e bf16 peak (~197 TFLOP/s), from XLA's own FLOP
    # count for the train step (round-2 VERDICT task 4: a per-model MFU column)
    try:
        lowered = jax.jit(model._train_step_fn).lower(
            model.params, model.batch_stats, model.opt_state, dimages, dgt, lr,
            *extra)
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan"))) if ca else float("nan")
        result["train_step_tflop"] = round(flops / 1e12, 3)
        result["mfu_pct"] = round(flops / dt / 197e12 * 100.0, 1)
    except Exception as e:
        result["mfu_note"] = f"cost_analysis unavailable: {e!r}"[:200]

    # p50 inference latency (test mode, batch 1, full on-device decode).
    # Integral 0..255 pixels — what a decoded image actually contains — so the
    # latency path exercises the lossless uint8 transfer (base.test_one_image);
    # non-integral float inputs would measure the same program plus 3x more
    # tunnel bytes.
    test_cfg = dict(spec["config"])
    test_cfg["mode"] = "test"
    tm = cls(test_cfg, None)
    img1 = np.floor(images[:1])
    tm.test_one_image(img1)  # compile
    times = []
    for _ in range(latency_runs):
        t0 = time.perf_counter()
        tm.test_one_image(img1)
        times.append(time.perf_counter() - t0)
    result["infer_p50_ms"] = round(float(np.percentile(times, 50)) * 1000, 2)
    return result


def main():
    names = sys.argv[1:] or ["SSD300", "YOLOv3", "CenterNet"]
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in names:
        print("=== bench", name, flush=True)
        try:
            results[name] = bench_model(name, _specs()[name])
        except Exception as e:  # keep going; record the failure
            results[name] = {"error": repr(e)[:500]}
        print(name, "->", results[name], flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
