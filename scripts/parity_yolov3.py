"""YOLOv3 decode parity vs the RUNNING TF1 reference.

Builds the reference YOLOv3 graph (test mode, random weights) under tf.compat.v1,
intercepts the three raw 5-D head prediction tensors (YOLOv3.py:95-97), feeds them
through tpudet's yolov3_decode — which reproduces quirks Q3 (additive hw decode) and
Q4 (inverted prior/stride pairing, head2 x32 / head3 x16 pixel scaling) — and
compares the final detections box-for-box against the reference's own output.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/YOLOv3.py"

PRIORS = [[[10.0, 13.0], [16, 30.0], [33.0, 23.0]],
          [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
          [[116.0, 90.0], [156.0, 198.0], [373.0, 326.0]]]


def build_reference(data_shape=(128, 128, 3), score_threshold=0.3):
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    tf1.set_random_seed(1234)
    contrib = types.ModuleType("contrib")
    contrib.layers = types.ModuleType("layers")
    contrib.layers.variance_scaling_initializer = tf1.variance_scaling_initializer
    tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1

    with open(REF) as f:
        src = f.read()
    module = types.ModuleType("reference_yolov3")
    exec(compile(src, REF, "exec"), module.__dict__)

    tf1.reset_default_graph()  # fresh graph per build
    tf1.set_random_seed(1234)
    config = {
        "mode": "test", "data_shape": list(data_shape), "num_classes": 20,
        "weight_decay": 5e-4, "keep_prob": 0.5, "data_format": "channels_last",
        "batch_size": 1,
        "coord_scale": 1, "noobj_scale": 1, "obj_scale": 5.0, "class_scale": 1.0,
        "num_priors": 3,
        "nms_score_threshold": score_threshold, "nms_max_boxes": 10,
        "nms_iou_threshold": 0.5,
        "priors": PRIORS,
    }
    model = module.YOLOv3(config, {"num_train": 0, "num_val": 0,
                                   "train_generator": (None, None),
                                   "val_generator": None})
    return model, tf1


def compare(score_threshold=0.3):
    import jax.numpy as jnp

    from tpudet.heads import yolo as yolo_head

    rng = np.random.default_rng(7)
    shape = (128, 128, 3)
    image = rng.uniform(0, 255, (1, *shape)).astype(np.float32)
    ref, tf1 = build_reference(shape, score_threshold)
    g = tf1.get_default_graph()
    # the three 5-D reshapes of the head outputs (YOLOv3.py:95-97)
    reshapes = [op for op in g.get_operations()
                if op.type == "Reshape" and op.name.startswith("head/Reshape")]
    five_d = [op.outputs[0] for op in reshapes
              if op.outputs[0].shape.ndims == 5]
    assert len(five_d) >= 3, [o.name for o in reshapes]
    preds_5d = ref.sess.run(five_d[:3], feed_dict={ref.images: image,
                                                   ref.is_training: False})
    # tame the raw logits (random weights blow up exp(hw) to inf in both
    # implementations, which is not a comparable regime) and feed the SAME values
    # into the reference's decode by overriding the intermediate tensors
    preds_5d = [np.clip(p, -4.0, 4.0).astype(np.float32) for p in preds_5d]
    rs, rb, rc = ref.sess.run(
        ref.detection_pred,
        feed_dict=dict(zip(five_d[:3], preds_5d)))
    ref.sess.close()

    # [1,H,W,K,C+5] -> tpudet layout [H,W,K*(C+5)]
    preds = [p[0].reshape(p.shape[1], p.shape[2], -1) for p in preds_5d]
    strides = (8.0, 16.0, 32.0)
    priors_per_head = [
        [[p[0] / s, p[1] / s] for p in head] for head, s in zip(PRIORS, strides)
    ]
    scores, boxes, cids, valid, _trunc = yolo_head.yolov3_decode(
        [jnp.asarray(p) for p in preds], priors_per_head, 20,
        score_threshold, 0.5, 10, pre_topk=400)
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
        # random weights can decode inf-sized boxes (exp of large logits) in BOTH
        # implementations: require identical non-finite patterns, compare the rest
        finite_r, finite_g = np.isfinite(rb), np.isfinite(gb)
        report["nonfinite_pattern_match"] = bool((finite_r == finite_g).all())
        both = finite_r & finite_g
        report["max_box_diff"] = float(np.abs(rb[both] - gb[both]).max())
        report["ok"] = (report["class_match"]
                        and report["nonfinite_pattern_match"]
                        and report["max_score_diff"] < 1e-5
                        and report["max_box_diff"] < 1e-2)
    else:
        report["ok"] = False
    return report


if __name__ == "__main__":
    print(compare())
