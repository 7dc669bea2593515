"""YOLOv2 decode parity vs the RUNNING TF1 reference.

Builds the reference YOLOv2 graph (test mode, random weights) under tf.compat.v1,
intercepts the single 5-D head prediction tensor (YOLOv2.py:96), feeds the SAME
values through both the reference's decode (by overriding the intermediate tensor)
and tpudet's yolov2_decode — which reproduces quirk Q3 (additive ``hw = prior + e^p``
decode, YOLOv2.py:190) and the stride-32 pixel scaling — and compares the final
detections box-for-box.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/YOLOv2.py"

PRIORS = [[1.08, 1.19], [3.42, 4.41], [6.63, 11.38], [9.42, 5.11], [16.62, 10.52]]


def build_reference(data_shape=(160, 160, 3), score_threshold=0.3):
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    contrib = types.ModuleType("contrib")
    contrib.layers = types.ModuleType("layers")
    contrib.layers.variance_scaling_initializer = tf1.variance_scaling_initializer
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1

    with open(REF) as f:
        src = f.read()
    module = types.ModuleType("reference_yolov2")
    exec(compile(src, REF, "exec"), module.__dict__)

    tf1.reset_default_graph()
    tf1.set_random_seed(1234)
    config = {
        "mode": "test", "data_shape": list(data_shape), "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 0.5, "data_format": "channels_last",
        "batch_size": 1,
        "coord_scale": 1, "noobj_scale": 1, "obj_scale": 5.0, "class_scale": 1.0,
        "nms_score_threshold": score_threshold, "nms_max_boxes": 10,
        "nms_iou_threshold": 0.5,
        "rescore_confidence": False,
        "priors": PRIORS,
    }
    model = module.YOLOv2(config, {"num_train": 0, "num_val": 0,
                                   "train_generator": (None, None),
                                   "val_generator": None})
    return model, tf1


def compare(score_threshold=0.3):
    import jax.numpy as jnp

    from tpudet.heads import yolo as yolo_head

    rng = np.random.default_rng(11)
    shape = (160, 160, 3)
    image = rng.uniform(0, 255, (1, *shape)).astype(np.float32)
    ref, tf1 = build_reference(shape, score_threshold)
    g = tf1.get_default_graph()
    five_d = [op.outputs[0] for op in g.get_operations()
              if op.type == "Reshape" and op.name.startswith("head/Reshape")
              and op.outputs[0].shape.ndims == 5]
    assert len(five_d) == 1, [t.name for t in five_d]
    pred_5d = ref.sess.run(five_d[0], feed_dict={ref.images: image,
                                                 ref.is_training: False})
    # clip raw logits (random weights push exp(hw) to inf — not a comparable
    # regime) and feed the SAME tensor through the reference's decode
    pred_5d = np.clip(pred_5d, -4.0, 4.0).astype(np.float32)
    rs, rb, rc = ref.sess.run(ref.detection_pred,
                              feed_dict={five_d[0]: pred_5d})
    ref.sess.close()

    pred = pred_5d[0].reshape(pred_5d.shape[1], pred_5d.shape[2], -1)
    scores, boxes, cids, valid, _trunc = yolo_head.yolov2_decode(
        jnp.asarray(pred), PRIORS, 20, 32.0, score_threshold, 0.5, 10,
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
        report["ok"] = (report["class_match"]
                        and report["max_score_diff"] < 1e-5
                        and report["max_box_diff"] < 1e-2)
    else:
        report["ok"] = False
    return report


if __name__ == "__main__":
    print(compare())
