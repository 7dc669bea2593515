"""YOLOv2 loss parity vs NumPy oracle + YOLO decode/model smoke tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet.heads import yolo as yolo_head


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def sig_ce(logits, targets):
    return np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits)))


def yolov2_loss_oracle(pred, priors, gt_padded, C, rate, scales):
    """Transcription of YOLOv2.py:103-173 (unclamped IoU, swapped-corner noobj)."""
    fh, fw = pred.shape[0], pred.shape[1]
    K = len(priors)
    pred = pred.reshape(fh, fw, K, C + 5)
    pclass, pyx, phw, pobj = (pred[..., :C], pred[..., C:C + 2],
                              pred[..., C + 2:C + 4], pred[..., C + 4:])
    col = gt_padded[:, 0]
    n = int(np.argmin(col)) if (col < 0).any() else len(col)
    gt = gt_padded[:n] / np.asarray([rate, rate, rate, rate, 1.0])
    gn_yx, gn_hw, label = gt[:, :2], gt[:, 2:4], gt[:, 4].astype(int)
    cells = np.floor(gn_yx).astype(int)
    priors = np.asarray(priors, np.float64)

    coord = cls_l = obj_l = 0.0
    for gi in range(n):
        cy, cx = cells[gi]
        center = np.array([cy + 0.5, cx + 0.5])
        a_y1x1 = center - priors / 2
        a_y2x2 = center + priors / 2
        g1, g2 = gn_yx[gi] - gn_hw[gi] / 2, gn_yx[gi] + gn_hw[gi] / 2
        inter = np.prod(np.minimum(g2, a_y2x2) - np.maximum(g1, a_y1x1), -1)
        aarea = np.prod(priors, -1)
        garea = np.prod(g2 - g1)
        iou = inter / (aarea + garea - inter)
        k = int(np.argmax(iou))
        yx_t = gn_yx[gi] - np.floor(gn_yx[gi])
        hw_t = np.log(gn_hw[gi] / priors[k])
        coord += sig_ce(pyx[cy, cx, k], yx_t).sum()
        coord += 0.5 * np.square(phw[cy, cx, k] - hw_t).sum()
        onehot = np.zeros(C)
        onehot[label[gi]] = 1
        cls_l += sig_ce(pclass[cy, cx, k], onehot).sum()
        obj_l += sig_ce(pobj[cy, cx, k], 1.0).sum()

    has = np.zeros((fh, fw), bool)
    for gi in range(n):
        has[cells[gi, 0], cells[gi, 1]] = True
    noobj = 0.0
    for y in range(fh):
        for x in range(fw):
            if has[y, x]:
                continue
            center = np.array([y + 0.5, x + 0.5])
            c1 = center - priors / 2
            c2 = center + priors / 2
            gy1, gy2 = c1 - c2 / 2, c1 + c2 / 2  # swapped-corner pseudo boxes
            aarea = np.prod(gy2 - gy1, -1)
            best = np.full(K, -np.inf)
            for gi in range(n):
                g1, g2 = gn_yx[gi] - gn_hw[gi] / 2, gn_yx[gi] + gn_hw[gi] / 2
                inter = np.prod(np.minimum(g2, gy2) - np.maximum(g1, gy1), -1)
                garea = np.prod(g2 - g1)
                best = np.maximum(best, inter / (aarea + garea - inter))
            for k in range(K):
                if best[k] <= 0.6:
                    noobj += sig_ce(pobj[y, x, k, 0], 0.0)
    cs, cls_s, os_, ns = scales
    return cs * coord + cls_s * cls_l + os_ * obj_l + ns * noobj


class TestYOLOv2LossParity:
    @pytest.mark.parametrize("seed,ngt", [(0, 1), (1, 3)])
    def test_matches_oracle(self, seed, ngt):
        rng = np.random.default_rng(seed)
        fh = fw = 4
        C, K, rate = 5, 3, 32.0
        priors = [[1.0, 1.2], [2.5, 2.0], [4.0, 5.0]]
        pred = rng.normal(size=(fh, fw, K * (C + 5))).astype(np.float32) * 0.5
        gt = -np.ones((8, 5), np.float32)
        for i in range(ngt):
            yx = rng.uniform(10, 118, 2)
            hw = rng.uniform(16, 60, 2)
            gt[i] = [yx[0], yx[1], hw[0], hw[1], rng.integers(0, C)]
        scales = (1.0, 1.0, 5.0, 1.0)
        want = yolov2_loss_oracle(pred.astype(np.float64), priors, gt, C, rate, scales)
        got = yolo_head.yolov2_loss(jnp.asarray(pred)[None], priors,
                                    jnp.asarray(gt)[None], C, rate, scales)
        np.testing.assert_allclose(float(got), want, rtol=3e-4)


class TestYOLODecode:
    def test_v2_decode_additive_hw(self):
        C, K = 3, 2
        fh = fw = 2
        priors = [[1.0, 1.0], [2.0, 2.0]]
        pred = np.zeros((fh, fw, K * (C + 5)), np.float32)
        pred[..., :] = -8.0  # everything low
        # cell (0,1), prior 0: class 1 strongly on, obj on, zero offsets
        base = 0
        view = pred.reshape(fh, fw, K, C + 5)
        view[0, 1, 0, :C] = [-8, 8, -8]
        view[0, 1, 0, C:C + 2] = 0.0   # sigmoid -> +0.5
        view[0, 1, 0, C + 2:C + 4] = 0.0  # exp -> +1
        view[0, 1, 0, C + 4] = 8.0
        del base
        scores, boxes, cid, valid, _ = yolo_head.yolov2_decode(
            jnp.asarray(pred), priors, C, 32.0, 0.5, 0.5, 4, pre_topk=8)
        valid = np.asarray(valid)
        assert valid.sum() == 1
        assert np.asarray(cid)[valid][0] == 1
        # center = (0.5+0.5, 1.5+0.5) = (1,2); hw = prior+e^0 = (2,2) -> corners*(32)
        np.testing.assert_allclose(np.asarray(boxes)[valid][0],
                                   [0, 32, 64, 96], atol=1e-3)


class TestConsistentGeometry:
    """Opt-in ``consistent_geometry`` extension: decode inverts the training
    encoding exactly (multiplicative hw = prior*e^p, true strides 32/16/8, large
    priors on the coarse head), so a head tensor encoding a gt box decodes back to
    that gt box on EVERY head — which quirks Q3/Q4 prevent by design."""

    def test_v3_roundtrip_every_head(self):
        C = 3
        img = 128
        gt_box = (40.0, 56.0, 36.0, 48.0)  # yc, xc, h, w in pixels
        priors_px = [[[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]],
                     [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
                     [[116.0, 90.0], [156.0, 198.0], [373.0, 326.0]]]
        head_strides = (32.0, 16.0, 8.0)
        # consistent prior layout: reversed, each / its own head stride
        priors_per_head = [
            [[p[0] / s, p[1] / s] for p in lvl]
            for lvl, s in zip(reversed(priors_px), head_strides)
        ]
        for h, stride in enumerate(head_strides):
            preds = []
            for j, s in enumerate(head_strides):
                fh = fw = int(img // s)
                pred = np.full((fh, fw, 3 * (C + 5)), -12.0, np.float32)
                if j == h:
                    yc, xc, bh, bw = (v / stride for v in gt_box)
                    cy, cx = int(yc), int(xc)
                    view = pred.reshape(fh, fw, 3, C + 5)
                    ty, tx = yc - cy, xc - cx
                    logit = lambda p: float(np.log(max(p, 1e-9) / (1 - min(p, 1 - 1e-9))))
                    view[cy, cx, 0, :C] = [-12, 12, -12]
                    view[cy, cx, 0, C:C + 2] = [logit(ty), logit(tx)]
                    view[cy, cx, 0, C + 2] = np.log(bh / priors_per_head[j][0][0])
                    view[cy, cx, 0, C + 3] = np.log(bw / priors_per_head[j][0][1])
                    view[cy, cx, 0, C + 4] = 12.0
                preds.append(jnp.asarray(pred))
            scores, boxes, cid, valid, _ = yolo_head.yolov3_decode(
                preds, priors_per_head, C, 0.5, 0.5, 4, pre_topk=8,
                consistent=True)
            valid = np.asarray(valid)
            assert valid.sum() == 1, f"head {h}"
            assert np.asarray(cid)[valid][0] == 1
            yc, xc, bh, bw = gt_box
            np.testing.assert_allclose(
                np.asarray(boxes)[valid][0],
                [yc - bh / 2, xc - bw / 2, yc + bh / 2, xc + bw / 2],
                atol=1e-2, err_msg=f"head {h}")

    def test_v3_model_accepts_flag(self):
        from tpudet.models.yolo import YOLOv3

        rng = np.random.default_rng(5)
        cfg = {
            "mode": "train", "data_format": "channels_last", "num_classes": 3,
            "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
            "nms_score_threshold": 0.3, "nms_max_boxes": 4,
            "nms_iou_threshold": 0.45, "coord_scale": 1.0, "noobj_scale": 1.0,
            "obj_scale": 1.0, "class_scale": 1.0, "num_priors": 3,
            "data_shape": [64, 64, 3], "consistent_geometry": True,
            "priors": [[[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]],
                       [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
                       [[116.0, 90.0], [156.0, 198.0], [373.0, 326.0]]],
            "nms_pre_topk": 16,
        }

        def batches():
            while True:
                images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
                gt = -np.ones((2, 6, 5), np.float32)
                gt[:, 0] = [32, 32, 20, 24, 1]
                yield images, gt

        provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                    "train_generator": (lambda: None, batches()),
                    "val_generator": None}
        model = YOLOv3(cfg, provider)
        # large priors land on head1 (stride 32) under the consistent layout
        assert model.priors_per_head[0][0][0] == 116.0 / 32.0
        loss = model.train_one_epoch(0.001)
        assert np.isfinite(loss)

    def test_v3_raw_prediction_conv(self):
        from tpudet.models.yolo import YOLOv3

        rng = np.random.default_rng(6)
        cfg = {
            "mode": "train", "data_format": "channels_last", "num_classes": 3,
            "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
            "nms_score_threshold": 0.3, "nms_max_boxes": 4,
            "nms_iou_threshold": 0.45, "coord_scale": 1.0, "noobj_scale": 1.0,
            "obj_scale": 1.0, "class_scale": 1.0, "num_priors": 3,
            "data_shape": [64, 64, 3], "consistent_geometry": True,
            "raw_prediction_conv": True,
            "priors": [[[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]],
                       [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
                       [[116.0, 90.0], [156.0, 198.0], [373.0, 326.0]]],
            "nms_pre_topk": 16,
        }

        def batches():
            while True:
                images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
                gt = -np.ones((2, 6, 5), np.float32)
                gt[:, 0] = [32, 32, 20, 24, 1]
                yield images, gt

        provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                    "train_generator": (lambda: None, batches()),
                    "val_generator": None}
        model = YOLOv3(cfg, provider)
        # the raw prediction layer is a plain conv with a bias, no BN scope
        pred = model.params["pyd1"]["pred"]
        assert "bias" in pred["conv"] and "bn" not in pred
        loss = model.train_one_epoch(0.001)
        assert np.isfinite(loss)
        res = model.test_one_image(
            rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
        assert len(res) == 3


def test_yolov2_model_end_to_end():
    from tpudet.models.yolo import YOLOv2

    rng = np.random.default_rng(0)
    cfg = {
        "mode": "train", "data_format": "channels_last", "num_classes": 4,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
        "data_shape": [64, 64, 3],
        "coord_scale": 1, "noobj_scale": 1, "obj_scale": 5.0, "class_scale": 1.0,
        "nms_score_threshold": 0.3, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "rescore_confidence": False,
        "priors": [[1.0, 1.2], [2.0, 2.0]],
        "nms_pre_topk": 16,
    }

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 6, 5), np.float32)
            gt[:, 0] = [32, 32, 20, 24, 1]
            yield images, gt

    provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    model = YOLOv2(cfg, provider)
    loss = model.train_one_epoch(0.001)
    assert np.isfinite(loss)
    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3


def test_yolov3_model_end_to_end():
    from tpudet.models.yolo import YOLOv3

    rng = np.random.default_rng(0)
    cfg = {
        "mode": "train", "data_format": "channels_last", "num_classes": 4,
        "weight_decay": 5e-4, "keep_prob": 1.0, "batch_size": 2,
        "data_shape": [64, 64, 3],
        "coord_scale": 1, "noobj_scale": 1, "obj_scale": 5.0, "class_scale": 1.0,
        "num_priors": 3,
        "nms_score_threshold": 0.3, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "priors": [[[10.0, 13.0], [16.0, 30.0], [33.0, 23.0]],
                   [[30.0, 61.0], [62.0, 45.0], [59.0, 119.0]],
                   [[116.0, 90.0], [156.0, 198.0], [373.0, 326.0]]],
        "nms_pre_topk": 16,
    }

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 6, 5), np.float32)
            gt[:, 0] = [32, 32, 20, 24, 1]
            gt[:, 1] = [16, 48, 10, 10, 3]
            yield images, gt

    provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    model = YOLOv3(cfg, provider)
    loss = model.train_one_epoch(0.001)
    assert np.isfinite(loss)
    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3
