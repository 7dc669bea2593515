"""Training-LOSS scalar parity vs the RUNNING TF1 reference (SSD300, YOLOv2,
RefineDet).

Round 1 validated losses against NumPy oracles transcribed by the same author — a
self-referential check. Here the reference's actual training graphs execute: each
model is built in mode:'train' with weight_decay=0, the flattened head tensors that
feed its loss are intercepted and OVERRIDDEN with controlled values (feed_dict works
on any tensor in TF1, including iterator outputs), ground truth is fed the same way,
and the reference's ``model.loss`` scalar is compared against tpudet's loss on the
IDENTICAL inputs. This covers the full assignment machinery — IoU matching,
best-anchor dedup, NMS-on-loss hard-negative mining (Q15), ARM->ODM cascade
filtering — as executed by the reference, not as transcribed.

Reference loss sites: SSD300.py:345-453 (+ mean at :148), YOLOv2.py:105-173,
RefineDet.py:420-561.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 4


def _force_cpu_jax():
    # compare against the CPU-executed reference without TPU-vs-CPU fp noise;
    # must run before the first jnp op (axon plugin overrides JAX_PLATFORMS env)
    import jax

    jax.config.update("jax_platforms", "cpu")


def _shims(tf1):
    contrib = types.ModuleType("contrib")
    contrib.layers = types.ModuleType("layers")
    contrib.layers.variance_scaling_initializer = tf1.variance_scaling_initializer
    contrib.framework = types.ModuleType("framework")
    contrib.framework.sort = tf1.sort
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1


def _load_module(path, patches=()):
    with open(path) as f:
        src = f.read()
    for old, new in patches:
        assert old in src
        src = src.replace(old, new)
    module = types.ModuleType("ref_" + os.path.basename(path)[:-3])
    module.__dict__["__file__"] = path
    exec(compile(src, path, "exec"), module.__dict__)
    return module


def _provider(tf1, shape, gt):
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 255, (BATCH * 2, *shape)).astype(np.float32)
    data = tf1.data.Dataset.from_tensor_slices(
        (images, np.concatenate([gt, gt], 0))).batch(BATCH).repeat()
    iterator = tf1.data.Iterator.from_structure(data.output_types,
                                                data.output_shapes)
    init_op = iterator.make_initializer(data)
    return {"data_shape": list(shape), "num_train": BATCH, "num_val": 0,
            "train_generator": (init_op, iterator), "val_generator": None}


def _gt_batch(rng, scale_hw):
    """[BATCH, 60, 5] center-format gt with 1-3 boxes per image."""
    h, w = scale_hw
    gt = -np.ones((BATCH, 60, 5), np.float32)
    for i in range(BATCH):
        for j in range(int(rng.integers(1, 4))):
            bh = rng.uniform(0.2, 0.6) * h
            bw = rng.uniform(0.2, 0.6) * w
            yc = rng.uniform(bh / 2, h - bh / 2)
            xc = rng.uniform(bw / 2, w - bw / 2)
            gt[i, j] = (yc, xc, bh, bw, rng.integers(0, 20))
    return gt


def _axis1_concats(g, scope="inference/"):
    """ndims-3 ConcatV2 ops under a scope, in creation order."""
    outs = []
    for op in g.get_operations():
        if op.type == "ConcatV2" and op.name.startswith(scope):
            t = op.outputs[0]
            if t.shape.ndims == 3:
                outs.append(t)
    return outs


# ------------------------------------------------------------------ SSD300
def compare_ssd300():
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)

    mod = _load_module("/root/reference/SSD300.py", patches=[
        ("        else:\n\n        self.global_step",
         "        else:\n            pass\n\n        self.global_step"),
        ("from tensorflow.python import pywrap_tensorflow as wrap",
         "import scripts_ref_helpers as wrap"),
    ])
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(21)
    gt = _gt_batch(rng, (300, 300))
    config = {"mode": "train", "data_format": "channels_last", "num_classes": 20,
              "weight_decay": 0.0, "keep_prob": 1.0, "batch_size": BATCH,
              "nms_score_threshold": 0.5, "nms_max_boxes": 20,
              "nms_iou_threshold": 0.5, "pretraining_weight": "<fake>"}
    model = mod.SSD300(config, _provider(tf1, (300, 300, 3), gt))
    g = tf1.get_default_graph()
    pbbox_yx_t, pbbox_hw_t, pconf_t = _axis1_concats(g)[:3]
    A = int(pconf_t.shape[1])
    pyx = rng.normal(0, 0.3, (BATCH, A, 2)).astype(np.float32)
    phw = rng.normal(0, 0.3, (BATCH, A, 2)).astype(np.float32)
    pconf = rng.normal(0, 1.0, (BATCH, A, 21)).astype(np.float32)
    ref_loss = model.sess.run(model.loss, feed_dict={
        pbbox_yx_t: pyx, pbbox_hw_t: phw, pconf_t: pconf,
        model.ground_truth: gt, model.is_training: True})
    model.sess.close()

    import jax.numpy as jnp

    from tpudet.heads import ssd as ssd_head
    from tpudet.models.ssd import _ssd_feat_shapes

    anc = ssd_head.build_anchors(300, _ssd_feat_shapes(300, (2, 2, 1, 2)))
    # neg_sel_cap must bound chosen_num_neg = min(num_neg, 3*num_pos) for exact
    # parity; the reference's budget is dynamic (SSD300.py:426-434)
    ours = float(ssd_head.ssd_loss(jnp.asarray(pconf), jnp.asarray(pyx),
                                   jnp.asarray(phw), anc, jnp.asarray(gt), 21,
                                   neg_sel_cap=2048))
    return {"model": "SSD300", "ref_loss": float(ref_loss), "our_loss": ours,
            "rel_diff": abs(ours - float(ref_loss)) / max(abs(float(ref_loss)), 1e-9),
            "ok": abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))}


# ------------------------------------------------------------------ YOLOv2
def compare_yolov2():
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)
    mod = _load_module("/root/reference/YOLOv2.py")
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(22)
    shape = (160, 160, 3)
    gt = _gt_batch(rng, shape[:2])
    priors = [[1.08, 1.19], [3.42, 4.41], [6.63, 11.38], [9.42, 5.11],
              [16.62, 10.52]]
    config = {"mode": "train", "data_shape": list(shape), "num_classes": 20,
              "weight_decay": 0.0, "keep_prob": 1.0,
              "data_format": "channels_last", "batch_size": BATCH,
              "coord_scale": 1.0, "noobj_scale": 1.0, "obj_scale": 5.0,
              "class_scale": 1.0, "nms_score_threshold": 0.5, "nms_max_boxes": 10,
              "nms_iou_threshold": 0.5, "rescore_confidence": False,
              "priors": priors}
    model = mod.YOLOv2(config, _provider(tf1, shape, gt))
    g = tf1.get_default_graph()
    five_d = [op.outputs[0] for op in g.get_operations()
              if op.type == "Reshape" and op.name.startswith("head/Reshape")
              and op.outputs[0].shape.ndims == 5]
    pred_t = five_d[0]
    fh, fw = int(pred_t.shape[1]), int(pred_t.shape[2])
    pred = rng.normal(0, 0.5, (BATCH, fh, fw, 5, 25)).astype(np.float32)
    ref_loss = model.sess.run(model.loss, feed_dict={
        pred_t: pred, model.ground_truth: gt, model.is_training: True})
    model.sess.close()

    import jax.numpy as jnp

    from tpudet.heads import yolo as yolo_head

    ours = float(yolo_head.yolov2_loss(
        jnp.asarray(pred.reshape(BATCH, fh, fw, -1)), priors, jnp.asarray(gt),
        20, 32.0, (1.0, 1.0, 5.0, 1.0)))
    return {"model": "YOLOv2", "ref_loss": float(ref_loss), "our_loss": ours,
            "rel_diff": abs(ours - float(ref_loss)) / max(abs(float(ref_loss)), 1e-9),
            "ok": abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))}


# ------------------------------------------------------------------ YOLOv3
def compare_yolov3():
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)
    mod = _load_module("/root/reference/YOLOv3.py")
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(24)
    shape = (224, 224, 3)
    gt = _gt_batch(rng, shape[:2])
    priors = [[[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]],
              [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
              [[116.0, 90.0], [156.0, 198.0], [373.0, 326.0]]]
    config = {"mode": "train", "data_shape": list(shape), "num_classes": 20,
              "weight_decay": 0.0, "keep_prob": 1.0,
              "data_format": "channels_last", "batch_size": BATCH,
              "coord_scale": 1.0, "noobj_scale": 1.0, "obj_scale": 5.0,
              "class_scale": 1.0, "num_priors": 3,
              "nms_score_threshold": 0.5, "nms_max_boxes": 10,
              "nms_iou_threshold": 0.5, "priors": priors}
    model = mod.YOLOv3(config, _provider(tf1, shape, gt))
    g = tf1.get_default_graph()
    five_d = [op.outputs[0] for op in g.get_operations()
              if op.type == "Reshape" and op.name.startswith("head/Reshape")
              and op.outputs[0].shape.ndims == 5]
    pred_ts = five_d[:3]  # pred1 (stride 32), pred2 (16), pred3 (8)
    strides = (32, 16, 8)
    preds = [rng.normal(0, 0.5, (BATCH, shape[0] // s, shape[1] // s, 3, 25))
             .astype(np.float32) for s in strides]
    ref_loss = model.sess.run(model.loss, feed_dict={
        **dict(zip(pred_ts, preds)),
        model.ground_truth: gt, model.is_training: True})
    model.sess.close()

    import jax.numpy as jnp

    from tpudet.heads import yolo as yolo_head

    priors_per_head = [[[ph / s for ph in p] for p in lvl]
                       for lvl, s in zip(priors, [8.0, 16.0, 32.0])]  # Q4
    ours = float(yolo_head.yolov3_loss(
        tuple(jnp.asarray(p.reshape(BATCH, p.shape[1], p.shape[2], -1))
              for p in preds),
        priors_per_head, jnp.asarray(gt), 20, (1.0, 1.0, 5.0, 1.0)))
    return {"model": "YOLOv3", "ref_loss": float(ref_loss), "our_loss": ours,
            "rel_diff": abs(ours - float(ref_loss)) / max(abs(float(ref_loss)), 1e-9),
            "ok": abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))}


# ------------------------------------------------------------------ RefineDet
def compare_refinedet():
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)
    mod = _load_module("/root/reference/RefineDet.py", patches=[
        ("from tensorflow.python import pywrap_tensorflow as wrap",
         "import scripts_ref_helpers as wrap"),
    ])
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(23)
    size = 320
    gt = _gt_batch(rng, (size, size))
    config = {"mode": "train", "input_size": size, "data_format": "channels_last",
              "num_classes": 20, "weight_decay": 0.0, "keep_prob": 1.0,
              "batch_size": BATCH, "nms_score_threshold": 0.1,
              "nms_max_boxes": 20, "nms_iou_threshold": 0.45,
              "pretraining_weight": "<fake>"}
    model = mod.RefineDet320(config, _provider(tf1, (size, size, 3), gt))
    g = tf1.get_default_graph()
    cc = _axis1_concats(g)
    arm_yx_t, arm_hw_t, arm_conf_t, odm_yx_t, odm_hw_t, odm_conf_t = cc[:6]
    A = int(arm_conf_t.shape[1])
    vals = {
        arm_yx_t: rng.normal(0, 0.3, (BATCH, A, 2)).astype(np.float32),
        arm_hw_t: rng.normal(0, 0.3, (BATCH, A, 2)).astype(np.float32),
        arm_conf_t: rng.normal(0, 1.0, (BATCH, A, 2)).astype(np.float32),
        odm_yx_t: rng.normal(0, 0.3, (BATCH, A, 2)).astype(np.float32),
        odm_hw_t: rng.normal(0, 0.3, (BATCH, A, 2)).astype(np.float32),
        odm_conf_t: rng.normal(0, 1.0, (BATCH, A, 21)).astype(np.float32),
    }
    ref_loss = model.sess.run(model.loss, feed_dict={
        **vals, model.ground_truth: gt, model.is_training: True})
    np_vals = list(vals.values())
    model.sess.close()

    import jax.numpy as jnp

    from tpudet.heads import refine as refine_head
    from tpudet.models.refinedet import _refine_feat_shapes

    anc = refine_head.build_anchors(_refine_feat_shapes(size))
    ours = float(refine_head.refine_loss(
        *[jnp.asarray(v) for v in np_vals], anc, jnp.asarray(gt), 21,
        neg_sel_cap=2048))
    return {"model": "RefineDet", "ref_loss": float(ref_loss), "our_loss": ours,
            "rel_diff": abs(ours - float(ref_loss)) / max(abs(float(ref_loss)), 1e-9),
            "ok": abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {"ssd300": compare_ssd300, "yolov2": compare_yolov2,
           "yolov3": compare_yolov3, "refinedet": compare_refinedet}
    for name, fn in fns.items():
        if which in (name, "all"):
            print(fn())
