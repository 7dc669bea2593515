"""FCOS decode parity vs the RUNNING TF1 reference.

The reference uses tf.contrib.layers.group_norm (absent in TF2's compat), so a
minimal GN shim is installed; we intercept the per-level (conf, reg, centerness)
head tensors and compare tpudet's fcos_decode (including quirk Q9 — the last class
is never emitted) box-for-box against the reference's detections.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/FCOS.py"


def _group_norm_shim(tf1):
    def group_norm(inputs, groups=8, channels_axis=3, reduction_axes=(1, 2),
                   trainable=True):
        del reduction_axes
        shape = inputs.get_shape().as_list()
        c = shape[channels_axis]
        with tf1.variable_scope(None, default_name="GroupNorm"):
            gamma = tf1.get_variable("gamma", [c], initializer=tf1.ones_initializer())
            beta = tf1.get_variable("beta", [c], initializer=tf1.zeros_initializer())
        n, h, w = tf1.shape(inputs)[0], shape[1], shape[2]
        x = tf1.reshape(inputs, [n, h, w, groups, c // groups])
        mean, var = tf1.nn.moments(x, [1, 2, 4], keep_dims=True)
        x = (x - mean) / tf1.sqrt(var + 1e-5)
        x = tf1.reshape(x, [n, h, w, c])
        return x * gamma + beta

    return group_norm


def build_reference(data_shape=(128, 128, 3), score_threshold=0.3):
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    tf1.set_random_seed(1234)
    contrib = types.ModuleType("contrib")
    contrib.layers = types.ModuleType("layers")
    contrib.layers.group_norm = _group_norm_shim(tf1)
    contrib.layers.variance_scaling_initializer = tf1.variance_scaling_initializer
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1

    with open(REF) as f:
        src = f.read()
    module = types.ModuleType("reference_fcos")
    exec(compile(src, REF, "exec"), module.__dict__)
    tf1.reset_default_graph()
    tf1.set_random_seed(1234)
    config = {
        "mode": "test", "data_shape": list(data_shape),
        "data_format": "channels_last", "num_classes": 20, "weight_decay": 1e-4,
        "keep_prob": 0.5, "batch_size": 1,
        "nms_score_threshold": score_threshold, "nms_max_boxes": 10,
        "nms_iou_threshold": 0.45,
    }
    model = module.FCOS(config, {"num_train": 0, "num_val": 0,
                                 "train_generator": (None, None),
                                 "val_generator": None})
    return model, tf1


def compare(score_threshold=0.25):
    import jax.numpy as jnp

    from tpudet.heads import fcos as fcos_head

    rng = np.random.default_rng(11)
    shape = (128, 128, 3)
    image = rng.uniform(0, 255, (1, *shape)).astype(np.float32)
    ref, tf1 = build_reference(shape, score_threshold)
    g = ref.sess.graph
    # per level the head emits conf (C=20), reg = exp(conv) (4), center (1);
    # reg is the only Exp op per level, conf/center are the final conv BiasAdds
    exps = [op.outputs[0] for op in g.get_operations()
            if op.type == "Exp" and op.name.startswith("head/")]
    biasadds = [op.outputs[0] for op in g.get_operations()
                if op.type == "BiasAdd" and op.name.startswith("head/")]
    confs = [t for t in biasadds if int(t.shape[-1]) == 20]
    centers = [t for t in biasadds if int(t.shape[-1]) == 1]
    assert len(exps) == 5 and len(confs) == 5 and len(centers) == 5, (
        len(exps), len(confs), len(centers))
    tensors = confs + exps + centers
    vals = ref.sess.run(tensors, feed_dict={ref.images: image,
                                            ref.is_training: False})
    # tame reg outputs (already exp'd -> clip to sane positive range)
    vals = [np.asarray(v, np.float32) for v in vals]
    for i in range(5, 10):
        vals[i] = np.clip(vals[i], 0.0, 64.0)
    rs, rb, rc = ref.sess.run(ref.detection_pred, feed_dict=dict(zip(tensors, vals)))
    ref.sess.close()

    level_preds = [
        (jnp.asarray(vals[i][0]), jnp.asarray(vals[5 + i][0]),
         jnp.asarray(vals[10 + i][0]))
        for i in range(5)
    ]
    scores, boxes, cids, valid, _trunc = fcos_head.fcos_decode(
        level_preds, 20, score_threshold, 0.45, 10, pre_topk=400)
    v = np.asarray(valid)
    gs, gb, gc = np.asarray(scores)[v], np.asarray(boxes)[v], np.asarray(cids)[v]

    def canon(s, b, c):
        o = np.lexsort((s, c))
        return np.asarray(s)[o], np.asarray(b)[o], np.asarray(c)[o]

    rs, rb, rc = canon(rs, rb, rc)
    gs, gb, gc = canon(gs, gb, gc)
    report = {"ref_num": len(rs), "got_num": len(gs)}
    if len(rs) == len(gs) and len(rs):
        report["class_match"] = bool((rc == gc).all())
        report["max_score_diff"] = float(np.abs(rs - gs).max())
        report["max_box_diff"] = float(np.abs(rb - gb).max())
        report["no_class_19"] = bool((gc != 19).all())  # quirk Q9
        report["ok"] = (report["class_match"] and report["no_class_19"]
                        and report["max_score_diff"] < 1e-5
                        and report["max_box_diff"] < 1e-2)
    else:
        report["ok"] = False
    return report


if __name__ == "__main__":
    print(compare())
