"""VOC mAP harness tests."""

import numpy as np

from tpudet.runtime import evaluate


def test_perfect_detections_ap1():
    gts = {0: np.asarray([[10, 10, 50, 50, 0], [60, 60, 90, 90, 1]], np.float64)}
    dets = {0: [(0.9, np.asarray([10, 10, 50, 50]), 0),
                (0.8, np.asarray([60, 60, 90, 90]), 1)]}
    mAP, aps = evaluate.evaluate_detections(dets, gts, 2)
    assert abs(mAP - 1.0) < 1e-6


def test_false_positive_lowers_ap():
    gts = {0: np.asarray([[10, 10, 50, 50, 0]], np.float64)}
    dets = {0: [(0.9, np.asarray([100, 100, 150, 150]), 0),
                (0.8, np.asarray([10, 10, 50, 50]), 0)]}
    mAP, _ = evaluate.evaluate_detections(dets, gts, 1)
    assert 0.0 < mAP < 1.0


def test_duplicate_detection_is_fp():
    gts = {0: np.asarray([[10, 10, 50, 50, 0]], np.float64)}
    dets = {0: [(0.9, np.asarray([10, 10, 50, 50]), 0),
                (0.8, np.asarray([11, 11, 51, 51]), 0)]}
    mAP_dup, _ = evaluate.evaluate_detections(dets, gts, 1)
    dets_single = {0: [(0.9, np.asarray([10, 10, 50, 50]), 0)]}
    mAP_single, _ = evaluate.evaluate_detections(dets_single, gts, 1)
    assert mAP_single >= mAP_dup


def test_voc_ap_11point():
    recall = np.asarray([0.2, 0.4, 1.0])
    precision = np.asarray([1.0, 0.8, 0.5])
    ap07 = evaluate.voc_ap(recall, precision, use_07_metric=True)
    ap_auc = evaluate.voc_ap(recall, precision, use_07_metric=False)
    assert 0 < ap07 <= 1 and 0 < ap_auc <= 1
