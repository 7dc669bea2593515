"""End-to-end integration: VOC dataset authoring -> TFRecords -> pipeline ->
detector training -> inference -> VOC07 mAP harness; plus VGG pretrained-weight
injection through the reference checkpoint name scheme."""

import os

import numpy as np
import pytest

from tpudet.data import pipeline, tfrecord, voc
from tpudet.runtime import evaluate, pretrain
from test_data import _make_voc_dataset


def test_voc_to_training_to_eval(tmp_path):
    from tpudet.models.ssd import SSD300

    class SSD64(SSD300):
        input_size = 64

    xml_dir, img_dir = _make_voc_dataset(str(tmp_path), n=8, hw=(64, 64))
    records = voc.dataset2tfrecord(xml_dir, img_dir, str(tmp_path / "rec"), "t",
                                   total_shards=1)
    aug = {
        "data_format": "channels_last", "output_shape": [64, 64],
        "flip_prob": [0.0, 0.5], "fill_mode": "BILINEAR",
        "keep_aspect_ratios": False, "constant_values": 0.0, "pad_truth_to": 10,
    }
    gen = pipeline.get_generator(records, 4, 64, aug, seed=0)
    provider = {"data_shape": [64, 64, 3], "num_train": 8, "num_val": 0,
                "train_generator": gen, "val_generator": None}
    config = {
        "mode": "train", "data_format": "channels_last", "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 4,
        "nms_score_threshold": 0.05, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "pretraining_weight": None, "hard_neg_cap": 64, "nms_pre_topk": 32,
    }
    model = SSD64(config, provider)
    loss1 = model.train_one_epoch(0.005)
    loss2 = model.train_one_epoch(0.005)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    gen[1].close()

    # eval harness over the raw records
    eval_records = []
    for rec in tfrecord.read_records(records[0]):
        image, shape, gt = voc.parse_voc_record(rec)
        eval_records.append((image, gt))
    mAP, aps = evaluate.evaluate_model(model, eval_records[:4])
    assert 0.0 <= mAP <= 1.0


def test_vgg_npz_injection(tmp_path):
    from tpudet.models.ssd import SSD300

    class SSD64(SSD300):
        input_size = 64

    # craft an npz with the reference's checkpoint names
    rng = np.random.default_rng(0)
    blobs = {}
    prev = 3
    for block, (width, reps) in enumerate(
            [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)], start=1):
        for i in range(1, reps + 1):
            blobs[f"vgg_16/conv{block}/conv{block}_{i}/weights"] = \
                rng.normal(0, 0.01, (3, 3, prev, width)).astype(np.float32)
            blobs[f"vgg_16/conv{block}/conv{block}_{i}/biases"] = \
                rng.normal(0, 0.01, width).astype(np.float32)
            prev = width
    path = str(tmp_path / "vgg_16.npz")
    np.savez(path, **blobs)

    config = {
        "mode": "test", "data_format": "channels_last", "num_classes": 20,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 1,
        "nms_score_threshold": 0.5, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "pretraining_weight": path,
    }
    m = SSD64(config, None)
    got = np.asarray(m.params["feature_extractor"]["vgg"]["conv3_2"]["conv"]["kernel"])
    np.testing.assert_allclose(got, blobs["vgg_16/conv3/conv3_2/weights"])
