"""Dense-scene inference at the reference's pad-60 gt contract (round-2 VERDICT
task 8): when far more candidates pass the score filter than the compiled
``nms_pre_topk``, ``test_one_image`` must detect truncation, retry with a doubled
budget, and land on EXACTLY the result a brute-force (all-anchors) decode produces
— the reference's per-class ``tf.image.non_max_suppression`` has no candidate cap,
so exactness under load is part of decode parity (SSD300.py:172-188).

Also drives ``evaluate_model`` end to end on images carrying 40-60 gt objects
(the VOC worst case the 60-slot contract exists for, image_augmentor.py:226-231).
"""

import numpy as np
import pytest

from tpudet.models.ssd import SSD300
from tpudet.runtime import evaluate


class SSD64(SSD300):
    input_size = 64


def _make_model(pre_topk):
    config = {
        "mode": "test", "data_format": "channels_last", "num_classes": 3,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 1,
        # threshold low enough that random-weight softmax (~1/4 per class)
        # floods every class's candidate list
        "nms_score_threshold": 0.01, "nms_max_boxes": 64,
        "nms_iou_threshold": 0.45, "pretraining_weight": None,
        "nms_pre_topk": pre_topk, "seed": 13,
    }
    return SSD64(config, None)


@pytest.mark.slow
def test_adaptive_pre_topk_matches_brute_force():
    rng = np.random.default_rng(0)
    image = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)

    model = _make_model(32)
    scores, boxes, cids = model.test_one_image(image)
    # the guard must have engaged: more candidates than 32 passed the filter,
    # so at least one doubled pre_topk decode was compiled
    assert len(model._infer_cache) > 1, sorted(model._infer_cache)
    assert len(scores) > 0

    num_anchors = int(model.anchors.yx.shape[0])
    brute = _make_model(num_anchors)  # same seed -> identical params
    bs, bb, bc = brute.test_one_image(image)
    assert len(brute._infer_cache) == 1  # full budget: no retry

    assert len(scores) == len(bs)
    np.testing.assert_array_equal(cids, bc)
    np.testing.assert_allclose(scores, bs, atol=1e-6)
    np.testing.assert_allclose(boxes, bb, atol=1e-4)


@pytest.mark.slow
def test_evaluate_model_dense_gt():
    rng = np.random.default_rng(1)
    records = []
    for _ in range(2):
        image = rng.uniform(0, 255, (96, 80, 3)).astype(np.float32)
        n = int(rng.integers(40, 61))  # the real-VOC worst case the 60-slot
        gt = np.zeros((n, 5), np.float32)  # contract exists for
        for k in range(n):
            h = rng.uniform(6, 40); w = rng.uniform(6, 40)
            y1 = rng.uniform(0, 96 - h); x1 = rng.uniform(0, 80 - w)
            gt[k] = [y1, y1 + h, x1, x1 + w, rng.integers(0, 3)]
        records.append((image, gt))

    model = _make_model(64)
    mAP, aps = evaluate.evaluate_model(model, records)
    assert np.isfinite(mAP) and 0.0 <= mAP <= 1.0
    assert len(aps) == 3
