"""Box-for-box parity against the RUNNING TF1 reference SSD300.

The reference graphs execute here under tf.compat.v1 (scripts/measure_reference_
baseline.py shims). This test feeds the reference's own head logits through tpudet's
full decode pipeline (anchors -> softmax -> background filter -> per-class NMS) and
requires EXACT detection parity: same count, same classes, scores/boxes within fp
tolerance (BASELINE.md "detections box-for-box within fp tolerance").

End-to-end (weights copied, image through both conv stacks) agreement is limited only
by conv accumulation-order numerics (oneDNN vs XLA), checked more loosely.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def reference_run():
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    import parity_ssd300 as P

    rng = np.random.default_rng(42)
    image = rng.uniform(0, 255, (1, 300, 300, 3)).astype(np.float32)
    ref, tf1 = P.build_reference_test_model(score_threshold=0.15)
    g = tf1.get_default_graph()
    ryx, rhw, rconf = ref.sess.run(
        [g.get_tensor_by_name("inference/concat_6:0"),
         g.get_tensor_by_name("inference/concat_7:0"),
         g.get_tensor_by_name("inference/concat_8:0")],
        feed_dict={ref.images: image, ref.is_training: False})
    rs, rb, rc = ref.test_one_image(image)
    values = P.reference_variables(ref, tf1)
    ref.sess.close()
    return image, (ryx, rhw, rconf), (np.asarray(rs), np.asarray(rb),
                                      np.asarray(rc)), values


def _canon(s, b, c):
    o = np.lexsort((s, c))
    return np.asarray(s)[o], np.asarray(b)[o], np.asarray(c)[o]


def test_decode_box_for_box(reference_run):
    """Identical logits -> identical detections."""
    _, (ryx, rhw, rconf), (rs, rb, rc), _ = reference_run
    from tpudet.heads import ssd as ssd_head
    from tpudet.models.ssd import _ssd_feat_shapes

    anc = ssd_head.build_anchors(300, _ssd_feat_shapes(300, (2, 2, 1, 2)))
    scores, boxes, cids, valid, _ = ssd_head.ssd_decode(
        jnp.asarray(rconf[0]), jnp.asarray(ryx[0]), jnp.asarray(rhw[0]), anc,
        0.15, 0.5, 20, pre_topk=2000)
    v = np.asarray(valid)
    gs, gb, gc = _canon(np.asarray(scores)[v], np.asarray(boxes)[v],
                        np.asarray(cids)[v])
    rs, rb, rc = _canon(rs, rb, rc)
    assert len(gs) == len(rs) and len(rs) > 50
    np.testing.assert_array_equal(gc, rc)
    np.testing.assert_allclose(gs, rs, atol=1e-5)
    np.testing.assert_allclose(gb, rb, atol=1e-3)


def test_yolov3_decode_box_for_box():
    """YOLOv3 decode (quirks Q3/Q4/Q5) vs the running reference: identical head
    tensors -> identical detections."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    from parity_yolov3 import compare

    report = compare()
    assert report["ok"], report


def test_loss_scalar_parity_vs_running_reference():
    """Training-loss scalars vs the reference's ACTUAL train graphs (wd=0, head
    tensors overridden with identical values): SSD300, YOLOv2, YOLOv3 and RefineDet
    losses match to fp tolerance — full assignment machinery (IoU matching,
    best-anchor dedup, Q15 NMS-on-loss mining, 3-scale routing + noobj pseudo-box
    masks, ARM->ODM cascade) as executed, not transcribed."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    import parity_loss

    for fn in (parity_loss.compare_ssd300, parity_loss.compare_yolov2,
               parity_loss.compare_yolov3, parity_loss.compare_refinedet):
        report = fn()
        assert report["ok"], report


def test_loss_scalar_parity_remaining_families():
    """Round-3: the four loss families round 2 left oracle-only, now vs the
    reference's ACTUAL train graphs — RetinaNet focal (RetinaNet.py:457-474),
    CenterNet gaussian-splat + penalty-reduced focal (CenterNet.py:211-250), FCOS
    IoU/centerness/heatmap (FCOS.py:311-347), and LH-RCNN's two-stage rpn+rcnn
    scalars incl. the 128/256 sampling, crop_and_resize and the Q12 yx-target
    quirk, with the RoI head running the reference's own dense weights
    (LH_RCNN.py:299-442, 140-177)."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    import parity_loss

    for fn in (parity_loss.compare_retinanet, parity_loss.compare_centernet,
               parity_loss.compare_fcos, parity_loss.compare_lhrcnn):
        report = fn()
        assert report["ok"], report


def test_yolov2_decode_box_for_box():
    """YOLOv2 single-head decode (quirk Q3, stride-32 passthrough) vs the running
    reference: identical head tensor -> identical detections."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    from parity_yolov2 import compare

    report = compare(score_threshold=0.1)
    assert report["ok"], report


def test_lhrcnn_decode_box_for_box():
    """LH-RCNN COMPOSED two-stage decode vs the running reference: proposal
    decode -> clip -> NMS(0.7) -> crop_and_resize (normalized by [h, w]) ->
    RoI dense head -> background drop -> per-class NMS, box-for-box."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    from parity_lhrcnn import compare

    # random-weight RoI softmax over 21 classes is near-uniform (~0.048)
    report = compare(score_threshold=0.03)
    assert report["ok"], report


def test_centernet_decode_box_for_box():
    """CenterNet peak-NMS top-k decode vs the running reference: exact."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    from parity_centernet import compare

    report = compare()
    assert report["ok"], report


def test_refinedet_decode_box_for_box():
    """RefineDet ARM->ODM cascade decode vs the running reference: exact.

    Runs in a fresh subprocess so in-process TF graph/session state from the
    other parity tests can't leak in; generous timeout because this 1-core
    host often runs a TPU convergence queue + its feeder concurrently (a
    single-threaded variant took >10 min under that load — the one full-suite
    failure of this test was the subprocess timeout, not a box mismatch)."""
    pytest.importorskip("tensorflow")
    import json as _json
    import subprocess

    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu"})
    # threshold below the near-uniform 1/21 logit mass yields detections
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_refinedet.py"),
         "0.048"],
        capture_output=True, text=True, timeout=2400, env=env, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("PARITY_JSON ")]
    assert line, f"no report:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    report = _json.loads(line[-1][len("PARITY_JSON "):])
    assert report["ok"], report


def test_fcos_decode_box_for_box():
    """FCOS distance-decode + centerness + Q9 class drop vs the running reference."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, "scripts")
    from parity_fcos import compare

    # pi-bias init keeps scores near 0.002; use a threshold that yields detections
    report = compare(score_threshold=0.001)
    assert report["ok"], report


def test_end_to_end_weight_copy(reference_run):
    """Weights copied into tpudet: logits agree to conv-numerics tolerance and the
    overwhelming majority of detections coincide."""
    image, (ryx, rhw, rconf), (rs, rb, rc), values = reference_run
    sys.path.insert(0, "scripts")
    import parity_ssd300 as P
    from tpudet.heads import ssd as ssd_head

    ours = P.inject_into_tpudet(values, score_threshold=0.15)
    pre = ours._preprocess(jnp.asarray(image))
    outs = ours.net.apply({"params": ours.params, "batch_stats": ours.batch_stats},
                          pre, False)
    oconf, oyx, ohw = ssd_head.flatten_preds(outs, ours.num_classes)
    scale = float(np.abs(rconf).max())
    assert float(np.abs(np.asarray(oconf[0]) - rconf[0]).max()) < 0.02 * scale
    # detection sets largely coincide (random-weight scores cluster at the score
    # threshold, so exact counts are numerically chaotic; the decode test above is
    # the exact-semantics check)
    gs, gb, gc = ours.test_one_image(image)
    matched = 0
    for s, b, c in zip(rs, rb, rc):
        same = (gc == c)
        if same.any() and np.abs(gb[same] - b).max(axis=-1).min() < 10.0:
            matched += 1
    # random-weight logit noise (~0.8%) moves boxes by a few px and flips
    # threshold-marginal detections; gross agreement is all this can assert
    assert matched >= 0.5 * len(rs), (matched, len(rs))
