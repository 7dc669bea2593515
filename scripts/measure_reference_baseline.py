"""Measure the TF1 reference's CPU training throughput (BASELINE.md protocol step 1).

Loads /root/reference/SSD300.py with the two minimal patches documented in
SURVEY.md §0.1 (the empty ``else:`` that breaks parsing, quirk Q1) plus the
compatibility shims needed to execute TF1 graph code under the installed TF2
(tf.compat.v1, a tf.contrib.framework.sort shim, and a fake vgg checkpoint reader
since no vgg_16.ckpt ships here — random init does not change throughput).

Feeds synthetic 300x300 batches through a tf.data iterator exactly like the
reference's input contract and times train steps. Writes the result into
BASELINE_CPU.json under ``reference_tf1_cpu_imgs_per_sec``.
"""

import json
import os
import sys
import time
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"  # tf1.layers needs tf_keras under Keras 3

import numpy as np

REF = "/root/reference/SSD300.py"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BASELINE_CPU.json")
BATCH = int(os.environ.get("REF_BATCH", 8))
STEPS = int(os.environ.get("REF_STEPS", 3))

# TF1-shaped VGG-16 conv variable shapes for the fake checkpoint reader
_VGG_SHAPES = {}
_prev = 3
for block, (width, reps) in enumerate(
        [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)], start=1):
    for i in range(1, reps + 1):
        _VGG_SHAPES[f"vgg_16/conv{block}/conv{block}_{i}/weights"] = (3, 3, _prev, width)
        _VGG_SHAPES[f"vgg_16/conv{block}/conv{block}_{i}/biases"] = (width,)
        _prev = width


class FakeReader:
    def get_tensor(self, name):
        rng = np.random.default_rng(abs(hash(name)) % 2**32)
        shape = _VGG_SHAPES[name]
        return rng.normal(0, 0.01, shape).astype(np.float32)


def load_reference_ssd300(tf):
    with open(REF) as f:
        src = f.read()
    # Q1 patch: empty else body (SSD300.py:41-43)
    src = src.replace("        else:\n\n        self.global_step",
                      "        else:\n            pass\n\n        self.global_step")
    # contrib shim + no-GPU pywrap import
    src = src.replace(
        "from tensorflow.python import pywrap_tensorflow as wrap",
        "import _ref_shims as wrap")
    module = types.ModuleType("reference_ssd300")
    module.__dict__["__file__"] = REF
    exec(compile(src, REF, "exec"), module.__dict__)
    return module.SSD300


def main():
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    # tf.contrib shim: only contrib.framework.sort is used (SSD300.py:386)
    contrib = types.ModuleType("contrib")
    contrib.framework = types.ModuleType("framework")
    contrib.framework.sort = tf1.sort
    tf1.contrib = contrib
    # shim module for the checkpoint reader import
    shims = types.ModuleType("_ref_shims")
    shims.NewCheckpointReader = lambda path: FakeReader()
    sys.modules["_ref_shims"] = shims
    sys.modules["tensorflow"] = tf1  # the reference does `import tensorflow as tf`

    SSD300 = load_reference_ssd300(tf1)

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (BATCH * 4, 300, 300, 3)).astype(np.float32)
    gt = -np.ones((BATCH * 4, 60, 5), np.float32)
    gt[:, 0] = [150, 150, 120, 90, 7]
    gt[:, 1] = [60, 200, 50, 70, 2]
    data = tf1.data.Dataset.from_tensor_slices((images, gt)).batch(BATCH).repeat()
    iterator = tf1.data.Iterator.from_structure(data.output_types, data.output_shapes)
    init_op = iterator.make_initializer(data)

    config = {
        "mode": "train", "data_format": "channels_last", "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": BATCH,
        "nms_score_threshold": 0.5, "nms_max_boxes": 20, "nms_iou_threshold": 0.5,
        "pretraining_weight": "<fake>",
    }
    provider = {"data_shape": [300, 300, 3], "num_train": BATCH * STEPS,
                "num_val": 0, "train_generator": (init_op, iterator),
                "val_generator": None}

    t0 = time.time()
    model = SSD300(config, provider)
    print(f"\ngraph build + init: {time.time() - t0:.1f}s")

    # warmup
    model.sess.run([model.train_op, model.loss],
                   feed_dict={model.lr: 0.001, model.is_training: True})
    t0 = time.perf_counter()
    for _ in range(STEPS):
        model.sess.run([model.train_op, model.loss],
                       feed_dict={model.lr: 0.001, model.is_training: True})
    dt = time.perf_counter() - t0
    rate = BATCH * STEPS / dt
    print(f"reference TF1 SSD300 CPU: {rate:.3f} imgs/s "
          f"({dt / STEPS:.1f} s/step at batch {BATCH})")

    blob = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            blob = json.load(f)
    blob["reference_tf1_cpu_imgs_per_sec"] = rate
    blob["reference_tf1_note"] = (
        f"reference SSD300.py run under tf.compat.v1 with the SURVEY.md Q1 parse "
        f"patch + contrib.sort shim; batch {BATCH}, {STEPS} timed steps, 1 CPU core")
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
