"""LH-RCNN composed two-stage decode parity vs the RUNNING TF1 reference.

The hardest decode family: proposal decode -> clip [0,(h,w)] -> NMS(0.7) keep 500 ->
crop_and_resize 7x7 (boxes normalized by [h,w]) -> RoI dense head -> per-proposal
argmax background drop -> per-class NMS (LH_RCNN.py:134-171, 205-240).

Protocol: build the reference graph (test mode, random weights) under tf.compat.v1,
intercept the two RPN conv outputs and the thin feature map, clip them to a
comparable regime, feed the SAME values back through the reference's decode via
feed_dict overrides, and through tpudet's ``lhrcnn_decode`` — with a RoI-head
closure built directly from the reference's dense-layer weights, so the full
composition (including ``tf.image.crop_and_resize`` semantics and the Q12-adjacent
decode ``yx = p*prop_hw + prop_yx``) is compared box-for-box.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/LH_RCNN.py"


def build_reference(data_shape=(320, 480, 3), score_threshold=0.1,
                    post_nms_proposal=300):
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    contrib = types.ModuleType("contrib")
    contrib.layers = types.ModuleType("layers")
    contrib.layers.variance_scaling_initializer = tf1.variance_scaling_initializer
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1

    with open(REF) as f:
        src = f.read()
    module = types.ModuleType("reference_lhrcnn")
    exec(compile(src, REF, "exec"), module.__dict__)

    tf1.reset_default_graph()
    tf1.set_random_seed(1234)
    config = {
        "mode": "test", "data_shape": list(data_shape), "is_pretraining": False,
        "data_format": "channels_last", "num_classes": 20, "weight_decay": 1e-4,
        "keep_prob": 0.5, "batch_size": 1,
        "rpn_first_step": 100, "rcnn_first_step": 200, "rpn_second_step": 300,
        "nms_score_threshold": score_threshold, "nms_max_boxes": 10,
        "nms_iou_threshold": 0.45, "post_nms_proposal": post_nms_proposal,
    }
    model = module.LHRCNN(config, {"num_train": 0, "num_val": 0,
                                   "train_generator": (None, None),
                                   "val_generator": None})
    return model, tf1


def compare(score_threshold=0.1, post_nms_proposal=300):
    import jax.numpy as jnp

    from tpudet.heads import lhrcnn as lh
    from tpudet.ops import nms  # noqa: F401 (forces CPU dispatch path import)

    rng = np.random.default_rng(5)
    shape = (320, 480, 3)
    h, w = shape[0], shape[1]
    image = rng.uniform(0, 255, (1, *shape)).astype(np.float32)
    ref, tf1 = build_reference(shape, score_threshold, post_nms_proposal)
    g = tf1.get_default_graph()

    def by_name(name):
        return g.get_tensor_by_name(name)

    # RPN conv outputs (post-BN, the tensors our _split_rpn consumes) and the thin
    # feature map (state5_conv1_2 + state5_conv2_2, LH_RCNN.py:98-102)
    # _conv_layer applies an unnamed BN after each conv (LH_RCNN.py:522-536), so
    # the post-BN layer outputs live under rpn/batch_normalization_N/cond/Merge in
    # creation order: rpn_conv (N=0), rpn_conf (N=1), rpn_pbbox (N=2)
    rpn_conf_t = by_name("rpn/batch_normalization_1/cond/Merge:0")
    rpn_loc_t = by_name("rpn/batch_normalization_2/cond/Merge:0")
    rcnn_feat_t = by_name("rcnn/add:0")  # thin feature: branch sum (LH_RCNN.py:102)

    vals = ref.sess.run([rpn_conf_t, rpn_loc_t, rcnn_feat_t],
                        feed_dict={ref.images: image, ref.is_training: False})
    rpn_conf, rpn_loc, rcnn_feat = [np.clip(v, -3.0, 3.0).astype(np.float32)
                                    for v in vals]
    rs, rb, rc = ref.sess.run(
        ref.detection_pred,
        feed_dict={rpn_conf_t: rpn_conf, rpn_loc_t: rpn_loc,
                   rcnn_feat_t: rcnn_feat})

    # RoI head closure from the reference's own dense weights
    names = ["rcnn/roi_feat_dense/kernel:0", "rcnn/roi_feat_dense/bias:0",
             "rcnn/rcnn_pconf/kernel:0", "rcnn/rcnn_pconf/bias:0",
             "rcnn/rcnn_pbbox/kernel:0", "rcnn/rcnn_pbbox/bias:0"]
    k1, b1, kc, bc, kb, bb = ref.sess.run([by_name(n) for n in names])
    ref.sess.close()

    def roi_fn(feats):
        x = feats.reshape(feats.shape[0], -1)
        x = jnp.maximum(x @ k1 + b1, 0.0)
        return x @ kc + bc, x @ kb + bb

    # our anchor set + border filtering (LH_RCNN.py:87-96)
    fh, fw = rpn_conf.shape[1], rpn_conf.shape[2]
    anchors, keep = lh.build_anchors(fh, fw, 32.0, float(h), float(w))
    keep_idx = np.where(keep)[0]
    conf = rpn_conf.reshape(-1, 2)[keep_idx]
    loc = rpn_loc.reshape(-1, 4)[keep_idx]

    scores, boxes, cids, valid, _trunc = lh.lhrcnn_decode(
        roi_fn, jnp.asarray(rcnn_feat[0]), jnp.asarray(loc[:, :2]),
        jnp.asarray(loc[:, 2:]), jnp.asarray(conf), anchors,
        float(h), float(w), 21, post_nms_proposal,
        score_threshold, 0.45, 10, pre_topk=post_nms_proposal)
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
        report["ok"] = (report["class_match"]
                        and report["max_score_diff"] < 1e-4
                        and report["max_box_diff"] < 5e-2)
    else:
        report["ok"] = False
    return report


if __name__ == "__main__":
    print(compare())
