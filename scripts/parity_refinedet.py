"""RefineDet cascade-decode parity vs the RUNNING TF1 reference.

Intercepts the reference's concatenated ARM/ODM head tensors (RefineDet.py:144-149)
and feeds identical values through tpudet's cascade decode
(tpudet.heads.refine.refine_decode: anchors -> ARM -> ODM with the 0.99 background
filter), comparing final detections box-for-box.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF = "/root/reference/RefineDet.py"


def build_reference(input_size=128, score_threshold=0.1):
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    tf1.set_random_seed(1234)
    contrib = types.ModuleType("contrib")
    contrib.framework = types.ModuleType("framework")
    contrib.framework.sort = tf1.sort
    tf1.contrib = contrib
    from measure_reference_baseline import FakeReader

    shims = types.ModuleType("_ref_shims2")
    shims.NewCheckpointReader = lambda path: FakeReader()
    sys.modules["_ref_shims2"] = shims
    sys.modules["tensorflow"] = tf1

    with open(REF) as f:
        src = f.read()
    src = src.replace("from tensorflow.python import pywrap_tensorflow as wrap",
                      "import _ref_shims2 as wrap")
    module = types.ModuleType("reference_refinedet")
    exec(compile(src, REF, "exec"), module.__dict__)
    tf1.reset_default_graph()
    tf1.set_random_seed(1234)
    config = {
        "mode": "test", "input_size": input_size, "data_format": "channels_last",
        "num_classes": 20, "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": 1,
        "nms_score_threshold": score_threshold, "nms_max_boxes": 20,
        "nms_iou_threshold": 0.45, "pretraining_weight": "<fake>",
    }
    model = module.RefineDet320(config, {"num_train": 0, "num_val": 0,
                                         "train_generator": (None, None),
                                         "val_generator": None})
    return model, tf1


def compare(score_threshold=0.1):
    import jax.numpy as jnp

    from tpudet.heads import refine as refine_head
    from tpudet.models.refinedet import _refine_feat_shapes

    rng = np.random.default_rng(5)
    size = 128
    image = rng.uniform(0, 255, (1, size, size, 3)).astype(np.float32)
    ref, tf1 = build_reference(size, score_threshold)
    g = ref.sess.graph
    two_ch, conf_ch = [], []
    for op in g.get_operations():
        if op.name.startswith("inference/concat") and op.type == "ConcatV2":
            t = op.outputs[0]
            if t.shape.ndims == 3 and int(t.shape[0]) == 1:
                if int(t.shape[-1]) == 2:
                    two_ch.append(t)
                elif int(t.shape[-1]) == 21:
                    conf_ch.append(t)
    # creation order (RefineDet.py:144-149): arm_yx, arm_hw, arm_conf,
    # odm_yx, odm_hw  (all [1,A,2]); odm_conf is the [1,A,21]
    arm_yx_t, arm_hw_t, arm_conf_t, odm_yx_t, odm_hw_t = two_ch[:5]
    odm_conf_t = conf_ch[0]
    tensors = [arm_yx_t, arm_hw_t, arm_conf_t, odm_yx_t, odm_hw_t, odm_conf_t]
    vals = ref.sess.run(tensors, feed_dict={ref.images: image,
                                            ref.is_training: False})
    vals = [np.clip(v, -4.0, 4.0).astype(np.float32) for v in vals]  # tame exps
    rs, rb, rc = ref.sess.run(ref.detection_pred, feed_dict=dict(zip(tensors, vals)))
    ref.sess.close()

    anc = refine_head.build_anchors(_refine_feat_shapes(size))
    assert anc.y1x1.shape[0] == vals[0].shape[1], (anc.y1x1.shape, vals[0].shape)
    scores, boxes, cids, valid, _trunc = refine_head.refine_decode(
        *(jnp.asarray(v[0]) for v in vals), anc, 21, score_threshold, 0.45, 20,
        pre_topk=400)
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
        report["ok"] = (report["class_match"] and report["max_score_diff"] < 1e-5
                        and report["max_box_diff"] < 1e-2)
    else:
        report["ok"] = False
    return report


if __name__ == "__main__":
    import json

    thr = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    print("PARITY_JSON " + json.dumps(compare(score_threshold=thr)))
