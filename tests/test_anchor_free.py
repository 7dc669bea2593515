"""FCOS + CenterNet: loss behavior tests and model smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet.heads import centernet as center_head
from tpudet.heads import fcos as fcos_head
from tpudet.ops import matching


class TestCenterNetLoss:
    def test_gaussian_sigma_global_min(self):
        h = jnp.asarray([10.0, 4.0])
        w = jnp.asarray([8.0, 5.0])
        valid = jnp.asarray([True, True])
        sigma = center_head._gaussian_sigma(h, w, valid)
        # must be a scalar (the reference's global reduce_min quirk)
        assert sigma.shape == ()
        sigma1 = center_head._gaussian_sigma(h[:1], w[:1], valid[:1])
        assert float(sigma) <= float(sigma1)

    def test_gaussian_sigma_reference_formulas(self):
        # NumPy transcription of CenterNet.py:255-270 (incl. the /2 — not
        # /(2*a) — quirk on every radius)
        h = np.asarray([10.0, 4.0, 23.0])
        w = np.asarray([8.0, 5.0, 3.0])
        mo = 0.7
        b1 = h + w
        r1 = (b1 + np.sqrt(b1 ** 2 - 4 * (w * h * (1 - mo) / (1 + mo)))) / 2.0
        b2 = 2.0 * (h + w)
        r2 = (b2 + np.sqrt(b2 ** 2 - 16.0 * ((1 - mo) * w * h))) / 2.0
        b3 = -2.0 * mo * (h + w)
        r3 = (b3 + np.sqrt(b3 ** 2 - 16.0 * mo * ((mo - 1) * w * h))) / 2.0
        expect = min(np.concatenate([r1, r2, r3]))
        got = center_head._gaussian_sigma(
            jnp.asarray(h, jnp.float32), jnp.asarray(w, jnp.float32),
            jnp.asarray([True, True, True]))
        np.testing.assert_allclose(float(got), expect, rtol=1e-6)

    def test_perfect_prediction_low_loss(self):
        h = w = 16
        C = 3
        gt = -np.ones((4, 5), np.float32)
        gt[0] = [32, 32, 16, 16, 1]  # center cell (8, 8) at stride 4
        keyp = np.full((h, w, C), -10.0, np.float32)
        keyp[8, 8, 1] = 10.0
        offset = np.zeros((h, w, 2), np.float32)
        size = np.zeros((h, w, 2), np.float32)
        size[8, 8] = [4.0, 4.0]
        loss = center_head.centernet_image_loss(
            jnp.asarray(keyp), jnp.asarray(offset), jnp.asarray(size),
            jnp.asarray(gt), C)
        bad_keyp = np.full((h, w, C), 0.0, np.float32)
        loss_bad = center_head.centernet_image_loss(
            jnp.asarray(bad_keyp), jnp.asarray(offset), jnp.asarray(size),
            jnp.asarray(gt), C)
        assert float(loss) < float(loss_bad)

    def test_decode_peak_topk(self):
        h = w = 8
        C = 2
        keyp = np.full((h, w, C), -8.0, np.float32)
        keyp[3, 4, 1] = 6.0
        offset = np.zeros((h, w, 2), np.float32)
        size = np.full((h, w, 2), 2.0, np.float32)
        scores, boxes, cid, valid = center_head.centernet_decode(
            jnp.asarray(keyp), jnp.asarray(offset), jnp.asarray(size), 0.5, 5)
        valid = np.asarray(valid)
        assert valid.sum() == 1
        assert np.asarray(cid)[valid][0] == 1
        np.testing.assert_allclose(np.asarray(boxes)[valid][0],
                                   [(3 - 1) * 4, (4 - 1) * 4, (3 + 1) * 4, (4 + 1) * 4],
                                   atol=1e-3)


class TestFCOSLoss:
    def test_level_routing_bands(self):
        gt = -np.ones((4, 5), np.float32)
        gt[0] = [100, 100, 32, 32, 0]   # size 32 -> level 0 only
        gt[1] = [200, 200, 64, 64, 1]   # size 64 -> levels 0 AND 1 (inclusive)
        g = matching.unpack_gt(jnp.asarray(gt))
        size = np.sqrt(np.maximum(np.asarray(g.hw[:, 0] * g.hw[:, 1]), 0))
        band0 = fcos_head.SIZE_BANDS[0]
        band1 = fcos_head.SIZE_BANDS[1]
        in0 = (size >= band0[0]) & (size <= band0[1]) & np.asarray(g.valid)
        in1 = (size >= band1[0]) & (size <= band1[1]) & np.asarray(g.valid)
        assert in0[0] and in0[1]
        assert not in1[0] and in1[1]

    def test_image_loss_finite_and_sensitive(self):
        rng = np.random.default_rng(0)
        C = 3
        shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        preds = []
        for fh, fw in shapes:
            preds.append((
                jnp.asarray(rng.normal(size=(fh, fw, C)).astype(np.float32)),
                jnp.exp(jnp.asarray(rng.normal(size=(fh, fw, 4)).astype(np.float32) * 0.2)),
                jnp.asarray(rng.normal(size=(fh, fw, 1)).astype(np.float32)),
            ))
        gt = -np.ones((6, 5), np.float32)
        gt[0] = [32, 32, 24, 30, 1]
        loss = fcos_head.fcos_image_loss(preds, jnp.asarray(gt), C)
        assert np.isfinite(float(loss)) and float(loss) > 0
        # empty gt -> zero loss on all levels
        empty = -np.ones((6, 5), np.float32)
        loss0 = fcos_head.fcos_image_loss(preds, jnp.asarray(empty), C)
        assert float(loss0) == 0.0

    def test_decode_drops_last_class(self):
        C = 3
        shapes = [(4, 4), (2, 2), (1, 1), (1, 1), (1, 1)]
        preds = []
        for fh, fw in shapes:
            conf = np.full((fh, fw, C), 8.0, np.float32)  # all classes confident
            reg = np.full((fh, fw, 4), 1.0, np.float32)
            cen = np.full((fh, fw, 1), 8.0, np.float32)
            preds.append((jnp.asarray(conf), jnp.asarray(reg), jnp.asarray(cen)))
        scores, boxes, cid, valid, _ = fcos_head.fcos_decode(preds, C, 0.5, 0.5, 4,
                                                          pre_topk=8)
        got_classes = set(np.asarray(cid)[np.asarray(valid)].tolist())
        assert C - 1 not in got_classes  # Q9


def test_centernet_model_end_to_end():
    from tpudet.models.centernet import CenterNet

    rng = np.random.default_rng(0)
    cfg = {
        "mode": "train", "data_format": "channels_last", "num_classes": 4,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
        "input_size": 64,
        "score_threshold": 0.1, "top_k_results_output": 10,
    }

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 6, 5), np.float32)
            gt[:, 0] = [32, 32, 20, 24, 1]
            yield images, gt

    provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    model = CenterNet(cfg, provider)
    loss = model.train_one_epoch(0.001)
    assert np.isfinite(loss)
    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3


def test_fcos_model_end_to_end():
    from tpudet.models.fcos import FCOS

    rng = np.random.default_rng(0)
    cfg = {
        "mode": "train", "data_format": "channels_last", "num_classes": 4,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
        "data_shape": [64, 64, 3],
        "nms_score_threshold": 0.3, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "nms_pre_topk": 16,
    }

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 6, 5), np.float32)
            gt[:, 0] = [32, 32, 24, 24, 1]
            yield images, gt

    provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    model = FCOS(cfg, provider)
    loss = model.train_one_epoch(0.01)
    assert np.isfinite(loss)
    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3
