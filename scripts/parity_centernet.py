"""CenterNet decode parity vs the RUNNING TF1 reference.

Intercepts the reference's keypoints/offset/size head tensors (CenterNet.py:132-134)
and feeds identical values through tpudet's peak-NMS top-k decode
(tpudet.heads.centernet.centernet_decode), comparing the final
[scores, boxes, class_ids] box-for-box.
"""

import os
import sys
import types

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/CenterNet.py"


def build_reference(input_size=128, score_threshold=0.3, top_k=20):
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    tf1.set_random_seed(1234)
    sys.modules["tensorflow"] = tf1
    with open(REF) as f:
        src = f.read()
    module = types.ModuleType("reference_centernet")
    exec(compile(src, REF, "exec"), module.__dict__)
    tf1.reset_default_graph()
    tf1.set_random_seed(1234)
    config = {
        "mode": "test", "input_size": input_size, "data_format": "channels_last",
        "num_classes": 20, "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": 1,
        "score_threshold": score_threshold, "top_k_results_output": top_k,
    }
    model = module.CenterNet(config, {"num_train": 0, "num_val": 0,
                                      "train_generator": (None, None),
                                      "val_generator": None})
    return model, tf1


def compare(score_threshold=0.3, top_k=20):
    import jax.numpy as jnp

    from tpudet.heads import centernet as center_head

    rng = np.random.default_rng(3)
    size = 128
    image = rng.uniform(0, 255, (1, size, size, 3)).astype(np.float32)
    ref, tf1 = build_reference(size, score_threshold, top_k)
    g = ref.sess.graph
    # the three center_detector head outputs (keypoints C=20, offset 2, size 2)
    # batch_normalization with a tensor `training` flag builds a cond; its Merge
    # output is the usable head tensor
    outs = {}
    for op in g.get_operations():
        if (op.name.startswith("center_detector/") and op.type == "Merge"
                and op.outputs[0].shape.ndims == 4):
            t = op.outputs[0]
            ch = int(t.shape[-1])
            outs.setdefault(ch, []).append(t)
    keyp_t = outs[20][0]
    offset_t, size_t = outs[2][0], outs[2][1]
    keyp, off, sz = ref.sess.run([keyp_t, offset_t, size_t],
                                 feed_dict={ref.images: image,
                                            ref.is_training: False})
    rs, rb, rc = ref.sess.run(ref.detection_pred,
                              feed_dict=dict(zip([keyp_t, offset_t, size_t],
                                                 [keyp, off, sz])))
    ref.sess.close()

    scores, boxes, cids, valid = center_head.centernet_decode(
        jnp.asarray(keyp[0]), jnp.asarray(off[0]), jnp.asarray(sz[0]),
        score_threshold, top_k)
    v = np.asarray(valid)
    gs, gb, gc = np.asarray(scores)[v], np.asarray(boxes)[v], np.asarray(cids)[v]

    report = {"ref_num": len(rs), "got_num": len(gs)}
    if len(rs) == len(gs) and len(rs):
        # reference output is already top-k sorted by score; ours too
        report["class_match"] = bool((np.asarray(rc) == gc).all())
        report["max_score_diff"] = float(np.abs(np.asarray(rs) - gs).max())
        report["max_box_diff"] = float(np.abs(np.asarray(rb) - gb).max())
        report["ok"] = (report["class_match"]
                        and report["max_score_diff"] < 1e-5
                        and report["max_box_diff"] < 1e-2)
    else:
        report["ok"] = False
    return report


if __name__ == "__main__":
    print(compare())
