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


# ------------------------------------------------------------------ RetinaNet
def compare_retinanet():
    """Focal loss + 0.4/0.5-band assignment as EXECUTED (RetinaNet.py:357-474)."""
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)
    mod = _load_module("/root/reference/RetinaNet.py")
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(25)
    size = 224
    gt = _gt_batch(rng, (size, size))
    config = {"mode": "train", "is_pretraining": False,
              "data_shape": [size, size, 3], "num_classes": 20,
              "weight_decay": 0.0, "keep_prob": 1.0,
              "data_format": "channels_last", "batch_size": BATCH,
              "is_bottleneck": True, "residual_block_list": [3, 4, 6, 3],
              "init_conv_filters": 16, "gamma": 2.0, "alpha": 0.25,
              "nms_score_threshold": 0.5, "nms_max_boxes": 10,
              "nms_iou_threshold": 0.45}
    model = mod.RetinaNet(config, _provider(tf1, (size, size, 3), gt))
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

    import math

    import jax.numpy as jnp

    from tpudet.heads import retina as retina_head
    from tpudet.models.retinanet import _stage_shapes

    stages = _stage_shapes(size, size, 4)
    p3, p4, p5 = stages[-3], stages[-2], stages[-1]
    p6 = (math.ceil(p5[0] / 2), math.ceil(p5[1] / 2))
    p7 = (math.ceil(p6[0] / 2), math.ceil(p6[1] / 2))
    anc = retina_head.build_anchors(size, [p3, p4, p5, p6, p7])
    assert anc.yx.shape[0] == A, (anc.yx.shape, A)
    ours = float(retina_head.retina_loss(
        jnp.asarray(pconf), jnp.asarray(pyx), jnp.asarray(phw), anc,
        jnp.asarray(gt), 21, 0.25, 2.0))
    return {"model": "RetinaNet", "ref_loss": float(ref_loss), "our_loss": ours,
            "rel_diff": abs(ours - float(ref_loss)) / max(abs(float(ref_loss)), 1e-9),
            "ok": abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))}


# ------------------------------------------------------------------ CenterNet
def compare_centernet():
    """Gaussian splat + penalty-reduced focal + L1 heads (CenterNet.py:187-270)."""
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)
    mod = _load_module("/root/reference/CenterNet.py")
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(26)
    size = 128
    gt = _gt_batch(rng, (size, size))
    config = {"mode": "train", "input_size": size, "data_format": "channels_last",
              "num_classes": 20, "weight_decay": 0.0, "keep_prob": 1.0,
              "batch_size": BATCH, "score_threshold": 0.3,
              "top_k_results_output": 20}
    model = mod.CenterNet(config, _provider(tf1, (size, size, 3), gt))
    g = tf1.get_default_graph()
    # the three center_detector head outputs (keypoints C=20, offset 2, size 2):
    # BN with a tensor training flag ends in cond/Merge (parity_centernet.py)
    outs = {}
    for op in g.get_operations():
        if (op.name.startswith("center_detector/") and op.type == "Merge"
                and op.outputs[0].shape.ndims == 4):
            t = op.outputs[0]
            outs.setdefault(int(t.shape[-1]), []).append(t)
    keyp_t, offset_t, size_t = outs[20][0], outs[2][0], outs[2][1]
    fh, fw = int(keyp_t.shape[1]), int(keyp_t.shape[2])
    keyp = rng.normal(0, 1.0, (BATCH, fh, fw, 20)).astype(np.float32)
    off = rng.normal(0, 0.3, (BATCH, fh, fw, 2)).astype(np.float32)
    sz = rng.normal(0, 0.3, (BATCH, fh, fw, 2)).astype(np.float32)
    ref_loss = model.sess.run(model.loss, feed_dict={
        keyp_t: keyp, offset_t: off, size_t: sz,
        model.ground_truth: gt, model.is_training: True})
    model.sess.close()

    import jax.numpy as jnp

    from tpudet.heads import centernet as center_head

    ours = float(center_head.centernet_loss(
        jnp.asarray(keyp), jnp.asarray(off), jnp.asarray(sz), jnp.asarray(gt),
        20, stride=float(size) / fh))
    return {"model": "CenterNet", "ref_loss": float(ref_loss), "our_loss": ours,
            "rel_diff": abs(ours - float(ref_loss)) / max(abs(float(ref_loss)), 1e-9),
            "ok": abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))}


# ------------------------------------------------------------------ FCOS
def compare_fcos():
    """Per-level inside-mask routing, -log(IoU), centerness-CE, heatmap focal
    (FCOS.py:152-348)."""
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)
    from parity_fcos import _group_norm_shim

    tf1.contrib.layers.group_norm = _group_norm_shim(tf1)
    mod = _load_module("/root/reference/FCOS.py")
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(27)
    # 256 is the smallest square input whose p7 (stride 128) stays 2x2 — the
    # reference's tf.squeeze(center_pred) collapses a 1x1 level to a scalar and
    # its loss graph fails to build (it never ran below 800x1200)
    size = 256
    gt = _gt_batch(rng, (size, size))
    config = {"mode": "train", "data_shape": [size, size, 3],
              "data_format": "channels_last", "num_classes": 20,
              "weight_decay": 0.0, "keep_prob": 1.0, "batch_size": BATCH,
              "nms_score_threshold": 0.3, "nms_max_boxes": 10,
              "nms_iou_threshold": 0.45}
    model = mod.FCOS(config, _provider(tf1, (size, size, 3), gt))
    g = tf1.get_default_graph()
    # per level: reg is the exp of the 4-channel conv, conf/center the final conv
    # BiasAdds. In TRAIN mode the loss graph (also under 'head/') adds its own Exp
    # ops from sigmoid cross-entropy, so require the [B,h,w,4] shape.
    exps = [op.outputs[0] for op in g.get_operations()
            if op.type == "Exp" and op.name.startswith("head/")
            and op.outputs[0].shape.ndims == 4
            and int(op.outputs[0].shape[-1]) == 4]
    biasadds = [op.outputs[0] for op in g.get_operations()
                if op.type == "BiasAdd" and op.name.startswith("head/")
                and op.outputs[0].shape.ndims == 4]
    confs = [t for t in biasadds if int(t.shape[-1]) == 20]
    centers = [t for t in biasadds if int(t.shape[-1]) == 1]
    assert len(exps) == 5 and len(confs) == 5 and len(centers) == 5, (
        len(exps), len(confs), len(centers))
    feeds = {model.ground_truth: gt, model.is_training: True}
    our_levels = []
    for conf_t, reg_t, cen_t in zip(confs, exps, centers):
        fh, fw = int(conf_t.shape[1]), int(conf_t.shape[2])
        conf = rng.normal(0, 1.0, (BATCH, fh, fw, 20)).astype(np.float32)
        reg = np.exp(rng.normal(0, 0.5, (BATCH, fh, fw, 4))).astype(np.float32)
        cen = rng.normal(0, 1.0, (BATCH, fh, fw, 1)).astype(np.float32)
        feeds[conf_t], feeds[reg_t], feeds[cen_t] = conf, reg, cen
        our_levels.append((conf, reg, cen))
    ref_loss = model.sess.run(model.loss, feed_dict=feeds)
    model.sess.close()

    import jax.numpy as jnp

    from tpudet.heads import fcos as fcos_head

    ours = float(fcos_head.fcos_loss(
        [tuple(jnp.asarray(t) for t in lvl) for lvl in our_levels],
        jnp.asarray(gt), 20))
    return {"model": "FCOS", "ref_loss": float(ref_loss), "our_loss": ours,
            "rel_diff": abs(ours - float(ref_loss)) / max(abs(float(ref_loss)), 1e-9),
            "ok": abs(ours - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))}


# ------------------------------------------------------------------ LH-RCNN
def compare_lhrcnn():
    """Two-stage loss: RPN assignment + 128/256 NMS sampling + proposal decode +
    crop_and_resize + RoI head CE/smooth-L1, with the Q12 yx-target quirk
    (LH_RCNN.py:299-442, 140-177). The RoI dense head runs with the REFERENCE's
    own weights on both sides, so the rcnn scalar compares the full composition."""
    _force_cpu_jax()
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    _shims(tf1)
    mod = _load_module("/root/reference/LH_RCNN.py", patches=[
        # expose the per-phase scalars (self.loss is a tf.case on global_step)
        ("""                                     default=lambda: rcnn_loss, exclusive=False)

            else:""",
         """                                     default=lambda: rcnn_loss, exclusive=False)
                self._parity_losses = (rpn_loss, rcnn_loss)

            else:"""),
        # Quirk Q21 (parity with INTENT, SURVEY.md §0.1 policy): the shipped line
        # gathers the [G]-row gt-label tensor with ANCHOR indices — out of bounds
        # at runtime for any real anchor count, so the reference's LH-RCNN train
        # graph cannot execute as shipped. The best-anchor rows are 1:1 with gt
        # rows in order, so the intended labels are rcnn_label itself.
        ("        best_rcnn_label = tf.gather(rcnn_label, best_raindex)",
         "        best_rcnn_label = rcnn_label  # Q21 minimal executability patch"),
    ])
    tf1.reset_default_graph()
    tf1.set_random_seed(99)
    rng = np.random.default_rng(28)
    shape = (224, 320, 3)
    h, w = shape[:2]
    gt = _gt_batch(rng, (h, w))
    config = {"mode": "train", "data_shape": list(shape), "is_pretraining": False,
              "data_format": "channels_last", "num_classes": 20,
              "weight_decay": 0.0, "keep_prob": 1.0, "batch_size": BATCH,
              "rpn_first_step": 100, "rcnn_first_step": 200,
              "rpn_second_step": 300, "nms_score_threshold": 0.5,
              "nms_max_boxes": 10, "nms_iou_threshold": 0.45,
              "post_nms_proposal": 300}
    model = mod.LHRCNN(config, _provider(tf1, shape, gt))
    g = tf1.get_default_graph()
    rpn_conf_t = g.get_tensor_by_name("rpn/batch_normalization_1/cond/Merge:0")
    rpn_loc_t = g.get_tensor_by_name("rpn/batch_normalization_2/cond/Merge:0")
    rcnn_feat_t = g.get_tensor_by_name("rcnn/add:0")
    fh, fw = int(rpn_conf_t.shape[1]), int(rpn_conf_t.shape[2])
    rpn_conf = np.clip(rng.normal(0, 1.0, (BATCH, fh, fw, 30)), -3, 3).astype(np.float32)
    rpn_loc = np.clip(rng.normal(0, 0.3, (BATCH, fh, fw, 60)), -3, 3).astype(np.float32)
    rcnn_feat = np.clip(rng.normal(0, 1.0, (BATCH, fh, fw, 490)), -3, 3).astype(np.float32)
    ref_rpn, ref_rcnn = model.sess.run(model._parity_losses, feed_dict={
        rpn_conf_t: rpn_conf, rpn_loc_t: rpn_loc, rcnn_feat_t: rcnn_feat,
        model.ground_truth: gt, model.is_training: True})
    names = ["rcnn/roi_feat_dense/kernel:0", "rcnn/roi_feat_dense/bias:0",
             "rcnn/rcnn_pconf/kernel:0", "rcnn/rcnn_pconf/bias:0",
             "rcnn/rcnn_pbbox/kernel:0", "rcnn/rcnn_pbbox/bias:0"]
    k1, b1, kc, bc, kb, bb = model.sess.run(
        [g.get_tensor_by_name(n) for n in names])
    model.sess.close()

    import jax.numpy as jnp

    from tpudet.heads import lhrcnn as lh
    from tpudet.ops import losses as loss_ops

    def roi_fn(feats):
        x = feats.reshape(feats.shape[0], -1)
        x = jnp.maximum(x @ k1 + b1, 0.0)
        return x @ kc + bc, x @ kb + bb

    anchors, keep = lh.build_anchors(fh, fw, 32.0, float(h), float(w))
    keep_idx = np.where(keep)[0]
    conf = rpn_conf.reshape(BATCH, -1, 2)[:, keep_idx]
    loc = rpn_loc.reshape(BATCH, -1, 4)[:, keep_idx]
    sample = lh.rpn_loss_and_sample(
        jnp.asarray(loc[:, :, :2]), jnp.asarray(loc[:, :, 2:]),
        jnp.asarray(conf), anchors, jnp.asarray(gt))
    our_rpn = float(loss_ops.weighted_mean(sample.rpn_loss, None))
    our_rcnn = float(lh.rcnn_losses(roi_fn, jnp.asarray(rcnn_feat), sample,
                                    float(h), float(w), 21))
    ok_rpn = abs(our_rpn - float(ref_rpn)) < 1e-3 * max(1.0, abs(float(ref_rpn)))
    ok_rcnn = abs(our_rcnn - float(ref_rcnn)) < 1e-3 * max(1.0, abs(float(ref_rcnn)))
    return {"model": "LHRCNN",
            "ref_loss": [float(ref_rpn), float(ref_rcnn)],
            "our_loss": [our_rpn, our_rcnn],
            "rel_diff": max(
                abs(our_rpn - float(ref_rpn)) / max(abs(float(ref_rpn)), 1e-9),
                abs(our_rcnn - float(ref_rcnn)) / max(abs(float(ref_rcnn)), 1e-9)),
            "ok": bool(ok_rpn and ok_rcnn)}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {"ssd300": compare_ssd300, "yolov2": compare_yolov2,
           "yolov3": compare_yolov3, "refinedet": compare_refinedet,
           "retinanet": compare_retinanet, "centernet": compare_centernet,
           "fcos": compare_fcos, "lhrcnn": compare_lhrcnn}
    for name, fn in fns.items():
        if which in (name, "all"):
            print(fn())
