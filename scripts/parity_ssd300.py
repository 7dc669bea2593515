"""Box-for-box inference parity: the TF1 reference SSD300 vs tpudet SSD300.

Builds the reference graph (tf.compat.v1 + the SURVEY.md Q1 patch) in test mode,
copies EVERY variable (VGG convs, extras conv+BN in creation order, the l2 norm
scale, prediction heads) into tpudet's SSD300 parameter tree, feeds both the same
image and compares [scores, boxes, class_ids].

Run directly (prints a report) or via tests/test_reference_parity.py.
"""

import os
import sys

os.environ["TF_USE_LEGACY_KERAS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_reference_test_model(batch=1, score_threshold=0.5):
    import types

    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    tf1.set_random_seed(1234)
    contrib = types.ModuleType("contrib")
    contrib.framework = types.ModuleType("framework")
    contrib.framework.sort = tf1.sort
    tf1.contrib = contrib
    from measure_reference_baseline import FakeReader, load_reference_ssd300

    shims = types.ModuleType("_ref_shims")
    shims.NewCheckpointReader = lambda path: FakeReader()
    sys.modules["_ref_shims"] = shims
    sys.modules["tensorflow"] = tf1

    SSD300 = load_reference_ssd300(tf1)
    tf1.reset_default_graph()  # fresh graph per build (parity tests build several)
    tf1.set_random_seed(1234)
    config = {
        "mode": "test", "data_format": "channels_last", "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": batch,
        "nms_score_threshold": score_threshold, "nms_max_boxes": 20, "nms_iou_threshold": 0.5,
        "pretraining_weight": "<fake>",
    }
    model = SSD300(config, {"num_train": 0, "num_val": 0,
                            "train_generator": (None, None), "val_generator": None})
    return model, tf1


_EXTRAS = ["conv6", "conv7", "conv8_1", "conv8_2", "conv9_1", "conv9_2",
           "conv10_1", "conv10_2", "conv11_1", "conv11_2"]


def reference_variables(model, tf1):
    values = {v.name: model.sess.run(v) for v in tf1.global_variables()}
    return values


def _bn_name(scope, idx):
    return (f"{scope}/batch_normalization/" if idx == 0
            else f"{scope}/batch_normalization_{idx}/")


def inject_into_tpudet(values, score_threshold=0.5):
    """Build tpudet SSD300 (test mode) and overwrite its tree with the reference's
    variables. Returns the model."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from tpudet.models import SSD300 as TpuSSD300

    config = {
        "mode": "test", "data_format": "channels_last", "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 0.5, "batch_size": 1,
        "nms_score_threshold": score_threshold, "nms_max_boxes": 20, "nms_iou_threshold": 0.5,
        "pretraining_weight": None,
    }
    m = TpuSSD300(config, None)
    params = traverse_util.flatten_dict(jax.tree.map(np.asarray, m.params), sep="/")
    stats = traverse_util.flatten_dict(jax.tree.map(np.asarray, m.batch_stats), sep="/")

    def put(tree, key, name):
        assert key in tree, key
        v = values[name]
        assert tree[key].shape == v.shape, (key, tree[key].shape, v.shape)
        tree[key] = v.astype(np.float32)

    # VGG trunk
    for block, reps in [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]:
        for i in range(1, reps + 1):
            layer = f"conv{block}_{i}"
            # the reference has a couple of typo'd variable names; resolve by suffix
            kname = [n for n in values
                     if n.startswith("feature_extractor/k") and n.endswith(
                         f"_{layer}:0")][0]
            bname = [n for n in values
                     if n.startswith("feature_extractor/bias_conv") and
                     n.replace("bias_conv_", "bias_conv").endswith(
                         f"conv{block}_{i}:0")][0]
            put(params, f"feature_extractor/vgg/{layer}/conv/kernel", kname)
            put(params, f"feature_extractor/vgg/{layer}/conv/bias", bname)
    # l2 norm scale
    put(params, "l2_norm/scale", "feature_extractor/l2_norm_factor:0")
    # extras: conv + BN in creation order
    for idx, name in enumerate(_EXTRAS):
        put(params, f"feature_extractor/{name}/conv/kernel",
            f"feature_extractor/{name}/kernel:0")
        put(params, f"feature_extractor/{name}/conv/bias",
            f"feature_extractor/{name}/bias:0")
        bn = _bn_name("feature_extractor", idx)
        put(params, f"feature_extractor/{name}/bn/scale", bn + "gamma:0")
        put(params, f"feature_extractor/{name}/bn/bias", bn + "beta:0")
        put(stats, f"feature_extractor/{name}/bn/mean", bn + "moving_mean:0")
        put(stats, f"feature_extractor/{name}/bn/var", bn + "moving_variance:0")
    # prediction heads
    for i in range(6):
        put(params, f"regressor/pred{i + 1}/conv/kernel",
            f"regressor/pred{i + 1}/kernel:0")
        put(params, f"regressor/pred{i + 1}/conv/bias",
            f"regressor/pred{i + 1}/bias:0")
        bn = _bn_name("regressor", i)
        put(params, f"regressor/pred{i + 1}/bn/scale", bn + "gamma:0")
        put(params, f"regressor/pred{i + 1}/bn/bias", bn + "beta:0")
        put(stats, f"regressor/pred{i + 1}/bn/mean", bn + "moving_mean:0")
        put(stats, f"regressor/pred{i + 1}/bn/var", bn + "moving_variance:0")

    from flax import traverse_util as tu

    m.params = jax.tree.map(jnp.asarray, tu.unflatten_dict(params, sep="/"))
    m.batch_stats = jax.tree.map(jnp.asarray, tu.unflatten_dict(stats, sep="/"))
    return m


def compare(tolerance=1e-2, score_threshold=0.15):
    rng = np.random.default_rng(42)
    image = rng.uniform(0, 255, (1, 300, 300, 3)).astype(np.float32)

    ref, tf1 = build_reference_test_model(score_threshold=score_threshold)
    values = reference_variables(ref, tf1)
    ref_scores, ref_boxes, ref_cids = ref.test_one_image(image)
    ref.sess.close()

    ours = inject_into_tpudet(values, score_threshold=score_threshold)
    got_scores, got_boxes, got_cids = ours.test_one_image(image)

    def canon(scores, boxes, cids):
        order = np.lexsort((scores, cids))
        return (np.asarray(scores)[order], np.asarray(boxes)[order],
                np.asarray(cids)[order])

    rs, rb, rc = canon(ref_scores, ref_boxes, ref_cids)
    gs, gb, gc = canon(got_scores, got_boxes, got_cids)
    report = {
        "ref_num": len(rs), "got_num": len(gs),
        "count_match": len(rs) == len(gs),
    }
    if report["count_match"] and len(rs):
        report["class_match"] = bool((rc == gc).all())
        report["max_score_diff"] = float(np.abs(rs - gs).max())
        report["max_box_diff"] = float(np.abs(rb - gb).max())
        report["ok"] = (report["class_match"]
                        and report["max_score_diff"] < tolerance
                        and report["max_box_diff"] < 300 * tolerance)
    else:
        report["ok"] = report["count_match"] and len(rs) == 0
    return report


if __name__ == "__main__":
    print(compare())
