"""Train every detector to convergence on the synthetic VOC-20 dataset and report
held-out VOC07 mAP — the north-star acceptance metric (BASELINE.md: "VOC07 mAP
parity, all 9 detectors"; real Pascal VOC is unreachable here, so the protocol runs
on scripts/synthvoc.py's 5,000-image 20-class dataset, trained to plateau).

Per model: reference batch/input configuration (drivers/test*.py), bf16 compute,
uint8 host->device images, on-device LR/TD flip augmentation, a staircase LR
schedule with warmup, loss curve + held-out mAP artifacts under
``.convergence/runs/<model>/``.

Usage:
  python scripts/train_convergence.py MODEL [--steps-scale S] [--smoke]
                                            [--eval-every=N] [--resume]
  python scripts/train_convergence.py all

--eval-every=N: run a held-out mAP evaluation every ~N training steps (on a
subset of the test split, appended to eval.jsonl in the run dir) so plateau
claims rest on a CURVE of mAP points, not a single end-of-run number (round-4
VERDICT missing #2: CenterNet's 0.259@12k -> 0.908@30k proved end-points can
be wildly misleading).
"""

from __future__ import annotations

import glob
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import synthvoc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_ROOT = os.path.join(ROOT, ".convergence", "data")
RUNS_ROOT = os.path.join(ROOT, ".convergence", "runs")


# ----------------------------------------------------------------- feeder
class MemmapFeeder:
    """Infinite (images uint8, gt) batch iterator over the rendered memmaps, with a
    one-deep prefetch thread so batch assembly overlaps the device step."""

    def __init__(self, images, gt, batch: int, seed: int = 0, depth: int = 3):
        self.images, self.gt, self.batch = images, gt, batch
        self.rng = np.random.default_rng(seed)
        self.q = queue.Queue(maxsize=depth)
        self.stop = threading.Event()
        self.t = threading.Thread(target=self._produce, daemon=True)
        self.t.start()

    def _produce(self):
        n = self.images.shape[0]
        order = np.arange(n)
        pos = n  # trigger shuffle on first use
        while not self.stop.is_set():
            if pos + self.batch > n:
                self.rng.shuffle(order)
                pos = 0
            idx = np.sort(order[pos:pos + self.batch])  # sorted: faster memmap IO
            pos += self.batch
            batch = (np.ascontiguousarray(self.images[idx]),
                     np.ascontiguousarray(self.gt[idx]))
            while not self.stop.is_set():
                try:
                    self.q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()

    def close(self):
        self.stop.set()


# ----------------------------------------------------------------- model specs
def _common(extra):
    cfg = {
        "mode": "train", "data_format": "channels_last", "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 0.5,
        "nms_score_threshold": 0.05, "nms_max_boxes": 40,
        "nms_iou_threshold": 0.45, "pretraining_weight": None,
        "compute_dtype": "bfloat16", "input_dtype": "uint8",
        "device_augment": {"flip_prob": [0.5, 0.5]},
        "loss_sync_every": 25,
    }
    cfg.update(extra)
    return cfg


def model_specs():
    """name -> (class path, input (h, w), config, base_lr, total_steps, schedule)

    schedule: list of (fraction_of_steps, lr_multiplier); warmup is the first entry.
    Steps are sized to plateau on the synthetic task (loss flattens well before the
    final ÷10 drops); LRs start from the reference driver values (BASELINE.md table)
    scaled where random-init + synthetic data needs it.
    """
    drop = [(0.05, 0.1), (0.70, 1.0), (0.20, 0.1), (0.05, 0.01)]
    return {
        "SSD300": ("tpudet.models.ssd.SSD300", (300, 300),
                   _common({"batch_size": 32}), 1e-3, 4000, drop),
        "SSD512": ("tpudet.models.ssd.SSD512", (512, 512),
                   _common({"batch_size": 32}), 1e-3, 4000, drop),
        "YOLOv2": ("tpudet.models.yolo.YOLOv2", (480, 480),
                   _common({"batch_size": 32, "coord_scale": 1,
                            "noobj_scale": 1, "obj_scale": 5.0, "class_scale": 1.0,
                            "rescore_confidence": False,
                            "priors": [[1.08, 1.19], [3.42, 4.41], [6.63, 11.38],
                                       [9.42, 5.11], [16.62, 10.52]],
                            "data_shape": [480, 480, 3]}),
                   5e-4, 5000, drop),
        "YOLOv3": ("tpudet.models.yolo.YOLOv3", (448, 448),
                   _common({"batch_size": 12, "weight_decay": 5e-4,
                            "coord_scale": 1, "noobj_scale": 1, "obj_scale": 5.0,
                            "class_scale": 1.0, "num_priors": 3,
                            "priors": [[[10.0, 13.0], [16, 30.0], [33.0, 23.0]],
                                       [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
                                       [[116.0, 90.0], [156.0, 198.0],
                                        [373.0, 326.0]]],
                            "data_shape": [448, 448, 3]}),
                   5e-4, 7000, drop),
        # opt-in consistent_geometry (decode inverts the training encoding —
        # quirk-faithful YOLOv3 decode cannot, by the reference's own Q3/Q4 design)
        # + raw_prediction_conv (the reference's BN+LeakyReLU prediction conv, Q5,
        # compresses negative logits 10x and objectness never separates — measured
        # obj>0.05 on ALL head-0 cells after 7k steps): the mAP-at-convergence
        # configuration; see tpudet/heads/yolo.py
        "YOLOv3-consistent": ("tpudet.models.yolo.YOLOv3", (448, 448),
                              _common({"batch_size": 12, "weight_decay": 5e-4,
                                       "coord_scale": 1, "noobj_scale": 1,
                                       "obj_scale": 5.0, "class_scale": 1.0,
                                       "num_priors": 3,
                                       "consistent_geometry": True,
                                       "raw_prediction_conv": True,
                                       "priors": [[[10.0, 13.0], [16, 30.0],
                                                   [33.0, 23.0]],
                                                  [[30.0, 61.0], [62.0, 45.0],
                                                   [59.0, 119.0]],
                                                  [[116.0, 90.0], [156.0, 198.0],
                                                   [373.0, 326.0]]],
                                       "data_shape": [448, 448, 3]}),
                              5e-4, 7000, drop),
        "YOLOv2-consistent": ("tpudet.models.yolo.YOLOv2", (480, 480),
                              _common({"batch_size": 32, "coord_scale": 1,
                                       "noobj_scale": 1, "obj_scale": 5.0,
                                       "class_scale": 1.0,
                                       "rescore_confidence": False,
                                       # consistent decode alone lifts v2 from
                                       # mAP 0.48 to 0.91 (result.json); the BN
                                       # prediction conv (no lrelu in v2) is fine
                                       "consistent_geometry": True,
                                       "priors": [[1.08, 1.19], [3.42, 4.41],
                                                  [6.63, 11.38], [9.42, 5.11],
                                                  [16.62, 10.52]],
                                       "data_shape": [480, 480, 3]}),
                              5e-4, 5000, drop),
        "RetinaNet": ("tpudet.models.retinanet.RetinaNet", (500, 500),
                      _common({"batch_size": 32, "is_bottleneck": True,
                               "residual_block_list": [3, 4, 6, 3],
                               "init_conv_filters": 16, "is_pretraining": False,
                               "gamma": 2.0, "alpha": 0.25,
                               "data_shape": [500, 500, 3]}),
                      1e-3, 4500, drop),
        # long variants: the 4.5k/12k curves were still falling at the lr drop
        # (CenterNet loss halving every ~1.2k steps at the 70% drop point) —
        # extend the base-lr segment (curve evidence in BASELINE.md)
        "RetinaNet-long": ("tpudet.models.retinanet.RetinaNet", (500, 500),
                           _common({"batch_size": 32, "is_bottleneck": True,
                                    "residual_block_list": [3, 4, 6, 3],
                                    "init_conv_filters": 16,
                                    "is_pretraining": False,
                                    "gamma": 2.0, "alpha": 0.25,
                                    "data_shape": [500, 500, 3]}),
                           1e-3, 9000,
                           [(0.03, 0.1), (0.87, 1.0), (0.07, 0.1), (0.03, 0.01)]),
        "CenterNet-long": ("tpudet.models.centernet.CenterNet", (384, 384),
                           _common({"batch_size": 15, "input_size": 384,
                                    "score_threshold": 0.05,
                                    "top_k_results_output": 40}),
                           1e-3, 30000,
                           [(0.02, 0.1), (0.88, 1.0), (0.07, 0.1), (0.03, 0.01)]),
        # host_feed + gt_pad 24: the proven-safe RefineDet-family config (the
        # bisect matrix in BASELINE.md isolates the TPU-worker crash to the fused
        # width-60 flip-gt remap; pad 24 passes under every feed/NMS/scan variant,
        # and is lossless for synthvoc's <=6 objects/image)
        "RefineDet320": ("tpudet.models.refinedet.RefineDet320", (320, 320),
                         _common({"batch_size": 32, "input_size": 320,
                                  "host_feed": True, "gt_pad": 24}),
                         5e-4, 5000, drop),
        "PFPNetR": ("tpudet.models.refinedet.PFPNetR", (320, 320),
                    _common({"batch_size": 32, "input_size": 320,
                             "host_feed": True, "gt_pad": 24}),
                    5e-4, 5000, drop),
        # the FULL reference data contract (pad_truth_to 60, testrefinedet.py:22)
        # with on-device augmentation, runnable via the split-dispatch workaround
        # for the fused-program worker fault ('device_augment_split', base.py)
        "RefineDet320-pad60": ("tpudet.models.refinedet.RefineDet320", (320, 320),
                               _common({"batch_size": 32, "input_size": 320,
                                        "host_feed": True,
                                        "device_augment_split": True}),
                               5e-4, 5000, drop),
        # host_feed: a 700x1100/800x1200 uint8 dataset is ~9-12 GB; the
        # device-resident gather path needs a layout copy of the whole dataset at
        # scan compile time (observed 18.45G > 15.75G HBM), so feed from host.
        "LHRCNN": ("tpudet.models.lhrcnn.LHRCNN", (700, 1100),
                   _common({"batch_size": 8, "data_shape": [700, 1100, 3],
                            "host_feed": True, "loss_sync_every": 2,
                            "is_pretraining": False,
                            "rpn_first_step": 2500, "rcnn_first_step": 4000,
                            "rpn_second_step": 5000, "post_nms_proposal": 500}),
                   3e-4, 6000, [(0.05, 0.1), (0.78, 1.0), (0.17, 0.1)]),
        # 12k steps: the penalty-reduced focal heatmap converges much slower than
        # the anchor losses (loss still falling fast at 5k)
        "CenterNet": ("tpudet.models.centernet.CenterNet", (384, 384),
                      _common({"batch_size": 15, "input_size": 384,
                               "score_threshold": 0.05,
                               "top_k_results_output": 40}),
                      1e-3, 12000, drop),
        "FCOS": ("tpudet.models.fcos.FCOS", (800, 1200),
                 _common({"batch_size": 8, "data_shape": [800, 1200, 3],
                          "host_feed": True, "gt_pad": 24}),
                 1e-3, 5000, drop),
        # 0.19 mAP at 5k steps with loss still falling: at bs8 the reference
        # schedule sees 3x fewer images than the SSD/RefineDet runs; extended
        # base-lr segment to a comparable image count. Chunked HBM residency
        # (the round-3 host feed ran 9 imgs/s vs 77 device-capable): ~10 GB
        # resident in 1.3 GB chunks, non-resident rows rotated in every 6 pins.
        "FCOS-long": ("tpudet.models.fcos.FCOS", (800, 1200),
                      _common({"batch_size": 8, "data_shape": [800, 1200, 3],
                               "chunk_bytes": 13 * 10**8, "rotate_every": 6,
                               "gt_pad": 24}),
                      1e-3, 15000,
                      [(0.01, 0.1), (0.89, 1.0), (0.07, 0.1), (0.03, 0.01)]),
        # FCOS-long landed at mAP 0.214 with the loss STILL falling slowly
        # (4.19@1k -> 3.45@15k) — and its base lr (1e-3) is 10x below the
        # reference's 0.01 (testfcos.py:16) while 15k steps is 15% of the
        # reference's 160-epoch schedule. Same spec at the reference lr, longer
        # warmup for the GN/exp-regression head:
        "FCOS-long2": ("tpudet.models.fcos.FCOS", (800, 1200),
                       _common({"batch_size": 8, "data_shape": [800, 1200, 3],
                                "chunk_bytes": 13 * 10**8, "rotate_every": 6,
                                "gt_pad": 24}),
                       1e-2, 15000,
                       [(0.03, 0.1), (0.87, 1.0), (0.07, 0.1), (0.03, 0.01)]),
        # fallback if long2 diverges at 1e-2:
        "FCOS-long3": ("tpudet.models.fcos.FCOS", (800, 1200),
                       _common({"batch_size": 8, "data_shape": [800, 1200, 3],
                                "chunk_bytes": 13 * 10**8, "rotate_every": 6,
                                "gt_pad": 24}),
                       3e-3, 15000,
                       [(0.03, 0.1), (0.87, 1.0), (0.07, 0.1), (0.03, 0.01)]),
        # long variants for the three possibly-undertrained rows (round-3
        # VERDICT weak #3): CenterNet-long's extended base-lr segment pattern
        # device-resident at the proven-safe pad-24 width (the worker fault is
        # pad-60-specific per the bisect matrix; smoke-probed before the run)
        "RefineDet320-long": ("tpudet.models.refinedet.RefineDet320",
                              (320, 320),
                              _common({"batch_size": 32, "input_size": 320,
                                       "gt_pad": 24}),
                              5e-4, 15000,
                              [(0.02, 0.1), (0.88, 1.0), (0.07, 0.1),
                               (0.03, 0.01)]),
        "LHRCNN-long": ("tpudet.models.lhrcnn.LHRCNN", (700, 1100),
                        _common({"batch_size": 8,
                                 "data_shape": [700, 1100, 3],
                                 "chunk_bytes": 13 * 10**8, "rotate_every": 6,
                                 "gt_pad": 24, "loss_sync_every": 2,
                                 "is_pretraining": False,
                                 "rpn_first_step": 5000,
                                 "rcnn_first_step": 8000,
                                 "rpn_second_step": 10000,
                                 "post_nms_proposal": 500}),
                        3e-4, 12000,
                        [(0.03, 0.1), (0.80, 1.0), (0.17, 0.1)]),
        # ------------------------------------------------------ round-5 legs
        # The Q-FCOS-objective counterfactual (round-4 VERDICT missing #1): the
        # SAME config as the best FCOS-long leg, with the opt-in standard-form
        # objective (tpudet/models/fcos.py docstring). If the 0.214 ceiling is
        # the reference objective's fault, THIS run reaches the family band.
        "FCOS-consistent": ("tpudet.models.fcos.FCOS", (800, 1200),
                            _common({"batch_size": 8,
                                     "data_shape": [800, 1200, 3],
                                     "chunk_bytes": 13 * 10**8,
                                     "rotate_every": 6, "gt_pad": 24,
                                     "consistent_objective": True}),
                            1e-3, 15000,
                            [(0.01, 0.1), (0.89, 1.0), (0.07, 0.1),
                             (0.03, 0.01)]),
        # LH-RCNN at the reference's bs32 contract (round-4 weak #5 flagged the
        # silent bs8 deviation). Phase boundaries keep the reference 4-phase
        # proportions (testlhrcnn.py: 60k/40k/60k/rest -> 10/6/4/4 of total);
        # the original 24k-step leg was cut by the round-5 wall clock at step
        # 2020 (rpn phase, ckpt-2020) — this 8k-step total resumes that ckpt
        # (2020 rpn steps < the 3350 rpn_first boundary, so the trained state
        # maps onto the shortened schedule exactly) and still carries 3.3x the
        # samples of the bs8 LHRCNN-long row (256k vs 96k imgs).
        # lr 2x the bs8 value (conservative sqrt-ish scaling for the 4x batch).
        # max_bytes 4.5G: bs32 activations at 700x1100 need the HBM the bs8 run
        # gave to residency.
        "LHRCNN-long2": ("tpudet.models.lhrcnn.LHRCNN", (700, 1100),
                         _common({"batch_size": 32,
                                  "data_shape": [700, 1100, 3],
                                  "chunk_bytes": 13 * 10**8, "rotate_every": 3,
                                  "max_bytes": 45 * 10**8,
                                  "gt_pad": 24, "loss_sync_every": 2,
                                  "is_pretraining": False,
                                  "rpn_first_step": 3350,
                                  "rcnn_first_step": 5350,
                                  "rpn_second_step": 6680,
                                  "post_nms_proposal": 500}),
                         6e-4, 8000,
                         [(0.03, 0.1), (0.80, 1.0), (0.17, 0.1)]),
        # PFPNetR parity with its RefineDet sibling (round-4 VERDICT #5): the
        # full reference data contract (pad 60 + split-dispatch augmentation,
        # proven on RefineDet320-pad60) and an extended-schedule leg.
        "PFPNetR-pad60": ("tpudet.models.refinedet.PFPNetR", (320, 320),
                          _common({"batch_size": 32, "input_size": 320,
                                   "host_feed": True,
                                   "device_augment_split": True}),
                          5e-4, 5000, drop),
        "PFPNetR-long": ("tpudet.models.refinedet.PFPNetR", (320, 320),
                         _common({"batch_size": 32, "input_size": 320,
                                  "gt_pad": 24}),
                         5e-4, 15000,
                         [(0.02, 0.1), (0.88, 1.0), (0.07, 0.1),
                          (0.03, 0.01)]),
    }


def _load_class(path):
    mod, cls = path.rsplit(".", 1)
    import importlib

    return getattr(importlib.import_module(mod), cls)


# ----------------------------------------------------------------- training
def run_model(name: str, steps_scale: float = 1.0, smoke: bool = False,
              resume: bool = False, eval_every: int = 0):
    spec = model_specs()[name]
    cls_path, (h, w), config, base_lr, total_steps, schedule = spec
    total_steps = int(total_steps * steps_scale)
    if smoke:
        total_steps = 60
        schedule = [(1.0, 1.0)]

    run_dir = os.path.join(RUNS_ROOT, name)
    os.makedirs(run_dir, exist_ok=True)
    curve_path = os.path.join(run_dir, "curve.jsonl")

    print(f"[{name}] rendering/loading dataset at {h}x{w} ...", flush=True)
    d = synthvoc.build(DATA_ROOT, h, w)
    train_images, train_gt, _, _ = synthvoc.load(d)

    batch = config["batch_size"]
    # gt_pad: slice the [N, 60, 5] gt memmap to a smaller -1-padded width (lossless
    # for synthvoc's <=6 objects/image). The gt-pad=60 shape is the isolated trigger
    # of the RefineDet-family axon TPU-worker kernel fault (.convergence/bisect2.log:
    # pad60 crashes even on pure random data; pad24 always passes).
    gt_pad = config.pop("gt_pad", None)
    if gt_pad is not None:
        train_gt = train_gt[:, :gt_pad]
    chunk_bytes = config.pop("chunk_bytes", None)
    rotate_every = config.pop("rotate_every", None)
    max_bytes = config.pop("max_bytes", 10 * 10**9)
    if config.pop("host_feed", False):
        feeder = MemmapFeeder(train_images, train_gt, batch, seed=1)
    elif chunk_bytes is not None:
        # Chunked HBM residency for the big-input models (800x1200 / 700x1100):
        # the dataset exceeds HBM, so K ~chunk_bytes arrays stay resident, each
        # scan dispatch binds ONE of them (no whole-set layout copy), and
        # rotation streams the non-resident remainder in for full coverage
        # (uploads double-buffered against the scan dispatch, device_dataset).
        from tpudet.data.device_dataset import DeviceDataset

        feeder = DeviceDataset(train_images, train_gt, batch, seed=1,
                               max_bytes=max_bytes, chunk_bytes=chunk_bytes,
                               rotate_every=rotate_every)
    else:
        # Device-resident feed: the tunneled host->device path (~100 MB/s, no
        # compute overlap — scripts/probe_transfer.py) costs 2-4x the train step
        # per batch; residing the dataset in HBM cuts the feed to an on-device
        # gather (and the whole epoch chunk runs as ONE lax.scan dispatch —
        # DetectorBase._train_scan).
        from tpudet.data.device_dataset import DeviceDataset

        feeder = DeviceDataset(train_images, train_gt, batch, seed=1,
                               max_bytes=10 * 10**9)
    provider = {"data_shape": [h, w, 3], "num_train": batch,  # set per chunk below
                "num_val": 0, "train_generator": feeder, "val_generator": None}

    print(f"[{name}] building model ...", flush=True)
    model = _load_class(cls_path)(config, provider)
    model.train_initializer = None  # feeder is infinite; no per-epoch reset

    # staircase schedule in chunks so the curve gets sampled and lr can step
    chunk = 50 if not smoke else 30
    ckpt_every = 500  # steps between periodic saves: a TPU/tunnel stall late in
    t0 = time.time()  # a run must not cost the whole run (--eval-only salvages)
    done_steps = 0
    meta_path = os.path.join(run_dir, "ckpt_meta.json")
    if resume and os.path.exists(meta_path):
        # continue a stall-cut run from its periodic checkpoint: params, batch
        # stats AND optimizer state reload (save_weight stores all three), the
        # schedule fast-forwards to the checkpoint step
        done_steps = int(json.load(open(meta_path))["steps"])
        model.load_weight(os.path.join(run_dir, "ckpt"))
        print(f"[{name}] resuming from step {done_steps}", flush=True)
    skip_steps = done_steps
    last_ckpt = done_steps
    curve = open(curve_path, "a" if done_steps else "w")

    # Stall watchdog: a wedged TPU tunnel blocks the dispatch forever (observed
    # round 2/3: process sleeping at 0% CPU, curve frozen). Exit fast so the
    # queue's next run gets the (recovered) chip and --eval-only can salvage the
    # periodic ckpt. Armed only after the first chunk (compile can take 15 min).
    progress = {"t": None, "armed": False}
    stall_limit = float(os.environ.get("STALL_LIMIT_S", 1800))

    def _watchdog():
        while True:
            time.sleep(60)
            if progress["armed"] and time.time() - progress["t"] > stall_limit:
                print(f"[{name}] STALLED: no chunk finished in {stall_limit:.0f}s"
                      f" at step {done_steps}; exiting (salvage via --eval-only)",
                      flush=True)
                os._exit(93)

    threading.Thread(target=_watchdog, daemon=True).start()

    # --eval-every: mid-run held-out mAP points (a 150-image subset keeps each
    # point to ~10-40 s of device time) appended to eval.jsonl; first call pays
    # the inference compile. Plateau claims then rest on >=3 mAP points.
    eval_state = {"records": None, "last": done_steps}

    def _mid_eval():
        from tpudet.runtime import evaluate

        if eval_state["records"] is None:
            eval_state["records"] = list(synthvoc.test_records(d))[:150]
        te = time.time()
        mAP_i, _ = evaluate.evaluate_model(model, eval_state["records"])
        rec = {"step": done_steps, "mAP@0.5_voc07": round(float(mAP_i), 4),
               "eval_images": len(eval_state["records"]),
               "eval_seconds": round(time.time() - te, 1),
               "elapsed_s": round(time.time() - t0, 1)}
        with open(os.path.join(run_dir, "eval.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"\n[{name}] mid-run eval @ {done_steps}: mAP {mAP_i:.4f} "
              f"({rec['eval_seconds']}s)", flush=True)

    for frac, mult in schedule:
        seg_steps = max(1, int(round(total_steps * frac)))
        lr = base_lr * mult
        if skip_steps > 0:  # --resume: fast-forward past completed segments
            ff = min(skip_steps, seg_steps)
            seg_steps -= ff
            skip_steps -= ff
        while seg_steps > 0 and done_steps < total_steps:
            this = min(chunk, seg_steps)
            model.num_train = this * batch
            mean_loss = model.train_one_epoch(lr)
            done_steps += this
            seg_steps -= this
            progress["t"] = time.time()
            progress["armed"] = True
            rec = {"step": done_steps, "lr": lr,
                   "mean_loss": round(float(mean_loss), 5),
                   "imgs_per_sec": round(done_steps * batch / (time.time() - t0), 1),
                   "elapsed_s": round(time.time() - t0, 1)}
            curve.write(json.dumps(rec) + "\n")
            curve.flush()
            if not np.isfinite(mean_loss):
                print(f"[{name}] DIVERGED at step {done_steps}", flush=True)
                feeder.close()
                curve.close()
                return {"model": name, "diverged_at": done_steps}
            if done_steps - last_ckpt >= ckpt_every:
                old = set(glob.glob(os.path.join(run_dir, "ckpt-*")))
                model.save_weight("latest", os.path.join(run_dir, "ckpt"))
                with open(os.path.join(run_dir, "ckpt_meta.json"), "w") as f:
                    json.dump({"steps": done_steps,
                               "elapsed_s": round(time.time() - t0, 1)}, f)
                last_ckpt = done_steps
                for p in old:  # keep only the newest periodic ckpt
                    os.unlink(p)
            if eval_every and done_steps - eval_state["last"] >= eval_every:
                eval_state["last"] = done_steps
                _mid_eval()
                progress["t"] = time.time()  # eval time isn't a feed stall
    curve.close()
    progress["armed"] = False  # eval pace varies; ckpt already safe on disk
    train_secs = time.time() - t0
    feeder.close()
    model.save_weight("latest", os.path.join(run_dir, "ckpt"))
    with open(os.path.join(run_dir, "ckpt_meta.json"), "w") as f:
        json.dump({"steps": done_steps, "elapsed_s": round(train_secs, 1)}, f)

    print(f"\n[{name}] trained {done_steps} steps in {train_secs:.0f}s; "
          f"evaluating ...", flush=True)
    from tpudet.runtime import evaluate

    n_eval = 50 if smoke else synthvoc.N_TEST
    records = list(synthvoc.test_records(d))[:n_eval]
    t1 = time.time()
    mAP, aps = evaluate.evaluate_model(model, records)
    result = {
        "model": name, "steps": done_steps, "batch": batch,
        "input": [h, w], "base_lr": base_lr,
        "train_seconds": round(train_secs, 1),
        "train_imgs_per_sec": round(done_steps * batch / train_secs, 1),
        "eval_images": len(records),
        "eval_seconds": round(time.time() - t1, 1),
        "mAP@0.5_voc07": round(float(mAP), 4),
        "per_class_AP": {str(k): round(float(v), 4) for k, v in sorted(aps.items())},
    }
    # Probe/smoke runs must not masquerade as convergence results: anything under
    # 500 steps goes to probe_result.json so nothing aggregating runs/*/result.json
    # can pick up a crash-bisect artifact as a real mAP (round-2 VERDICT weak #4).
    fname = "result.json" if (done_steps >= 500 and not smoke) else "probe_result.json"
    with open(os.path.join(run_dir, fname), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[{name}] mAP@0.5 = {mAP:.4f}  ({done_steps} steps, "
          f"{result['train_imgs_per_sec']} imgs/s)", flush=True)
    return result


def eval_from_checkpoint(name: str):
    """Salvage path: evaluate the latest periodic checkpoint of an interrupted
    run (TPU/tunnel stalls can kill a run after hours of training; the periodic
    ckpt + this mode turn that into a result instead of a rerun)."""
    spec = model_specs()[name]
    cls_path, (h, w), config, base_lr, total_steps, schedule = spec
    run_dir = os.path.join(RUNS_ROOT, name)
    meta = json.load(open(os.path.join(run_dir, "ckpt_meta.json")))
    d = synthvoc.build(DATA_ROOT, h, w)
    batch = config["batch_size"]
    for k in ("gt_pad", "host_feed", "chunk_bytes", "rotate_every", "max_bytes"):
        config.pop(k, None)
    provider = {"data_shape": [h, w, 3], "num_train": batch, "num_val": 0,
                "train_generator": iter(()), "val_generator": None}
    model = _load_class(cls_path)(config, provider)
    model.load_weight(os.path.join(run_dir, "ckpt"))  # resolves highest step
    from tpudet.runtime import evaluate

    records = list(synthvoc.test_records(d))[:synthvoc.N_TEST]
    t1 = time.time()
    mAP, aps = evaluate.evaluate_model(model, records)
    result = {
        "model": name, "steps": meta["steps"], "batch": batch,
        "input": [h, w], "base_lr": base_lr,
        "train_seconds": meta.get("elapsed_s"),
        "note": "evaluated from periodic checkpoint (run interrupted)",
        "eval_images": len(records), "eval_seconds": round(time.time() - t1, 1),
        "mAP@0.5_voc07": round(float(mAP), 4),
        "per_class_AP": {str(k): round(float(v), 4) for k, v in sorted(aps.items())},
    }
    fname = "result.json" if meta["steps"] >= 500 else "probe_result.json"
    with open(os.path.join(run_dir, fname), "w") as f:
        json.dump(result, f, indent=1)
    print(f"[{name}] mAP@0.5 = {mAP:.4f}  (ckpt @ {meta['steps']} steps)",
          flush=True)
    return result


ALL = ["SSD300", "YOLOv3", "SSD512", "YOLOv2", "RetinaNet", "RefineDet320",
       "PFPNetR", "CenterNet", "FCOS", "LHRCNN"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    smoke = "--smoke" in sys.argv
    scale = 1.0
    eval_every = 0
    for a in sys.argv[1:]:
        if a.startswith("--steps-scale="):
            scale = float(a.split("=")[1])
        if a.startswith("--eval-every="):
            eval_every = int(a.split("=")[1])
    names = ALL if (not args or args[0] == "all") else args
    results = []
    for name in names:
        try:
            if "--eval-only" in sys.argv:
                results.append(eval_from_checkpoint(name))
                continue
            results.append(run_model(name, steps_scale=scale, smoke=smoke,
                                     resume="--resume" in sys.argv,
                                     eval_every=eval_every))
        except Exception as e:  # keep the queue going; record the failure
            import traceback

            traceback.print_exc()
            results.append({"model": name, "error": repr(e)})
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
