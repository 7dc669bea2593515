"""SSD head parity tests (loss + decode vs NumPy oracle) and model smoke tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet.heads import ssd as ssd_head
import oracles


def _small_anchorset():
    # two tiny levels -> 4*4*4 + 2*2*6 = 88 anchors at input size 64
    return ssd_head.build_anchors(64, [(4, 4), (2, 2)],
                                  aspect_ratios=[[2, 1 / 2], [2, 1 / 2, 3, 1 / 3]])


def ssd_loss_oracle(pyx, phw, pconf, anc, gt_padded, c_total):
    """Dynamic-shape NumPy transcription of SSD300.py:345-453."""
    col = gt_padded[:, 0]
    n = int(np.argmin(col)) if (col < 0).any() else len(col)
    gt = gt_padded[:n]
    gyx, ghw, label = gt[:, 0:2], gt[:, 2:4], gt[:, 4].astype(int)
    gy1x1, gy2x2 = gyx - ghw / 2, gyx + ghw / 2
    a_y1x1, a_y2x2 = np.asarray(anc.y1x1), np.asarray(anc.y2x2)
    a_yx, a_hw = np.asarray(anc.yx), np.asarray(anc.hw)
    A = a_y1x1.shape[0]
    iou = oracles.iou_matrix(gy1x1, gy2x2, a_y1x1, a_y2x2)  # [n, A]

    best = iou.argmax(1)
    best_ce = oracles.softmax_ce(pconf[best], label)
    tyx = (gyx - a_yx[best]) / a_hw[best]
    thw = np.log(ghw / a_hw[best])
    best_coord = (oracles.smooth_l1(pyx[best] - tyx).sum(-1)
                  + oracles.smooth_l1(phw[best] - thw).sum(-1))

    bestmask = np.zeros(A, bool)
    bestmask[np.unique(best)] = True
    other = ~bestmask
    agiou = iou.T  # [A, n]
    best_ag, rg = agiou.max(1), agiou.argmax(1)
    pos = other & (best_ag > 0.5)
    neg = other & ~pos

    po_ce = oracles.softmax_ce(pconf[pos], label[rg[pos]])
    tyx_o = (gyx[rg] - a_yx) / a_hw
    thw_o = np.log(ghw[rg] / a_hw)
    po_coord = (oracles.smooth_l1(pyx - tyx_o).sum(-1)
                + oracles.smooth_l1(phw - thw_o).sum(-1))[pos]
    num_pos = n + int(pos.sum())
    pos_conf = (best_ce.sum() + po_ce.sum()) / num_pos
    pos_coord = (best_coord.sum() + po_coord.sum()) / num_pos

    neg_ce = oracles.softmax_ce(pconf, np.full(A, c_total - 1))
    nidx = np.where(neg)[0]
    nboxes = np.concatenate([a_y1x1, a_y2x2], -1)[nidx]
    chosen = min(len(nidx), 3 * num_pos)
    sel = oracles.tf_nms(nboxes, neg_ce[nidx], chosen, 0.7)
    neg_loss = neg_ce[nidx][sel].mean()
    return neg_loss + pos_conf + pos_coord


class TestSSDLossParity:
    @pytest.mark.parametrize("seed,ngt", [(0, 1), (1, 3), (2, 7)])
    def test_loss_matches_oracle(self, seed, ngt):
        rng = np.random.default_rng(seed)
        anc = _small_anchorset()
        A = anc.y1x1.shape[0]
        c_total = 6
        pconf = rng.normal(size=(A, c_total)).astype(np.float32)
        pyx = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        phw = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        gt = -np.ones((12, 5), np.float32)
        for i in range(ngt):
            yx = rng.uniform(10, 54, 2)
            hw = rng.uniform(8, 40, 2)
            gt[i] = [yx[0], yx[1], hw[0], hw[1], rng.integers(0, c_total - 1)]
        want = ssd_loss_oracle(pyx, phw, pconf, anc, gt, c_total)
        got = ssd_head.ssd_loss(
            jnp.asarray(pconf)[None], jnp.asarray(pyx)[None], jnp.asarray(phw)[None],
            anc, jnp.asarray(gt)[None], c_total, neg_sel_cap=96,
        )
        np.testing.assert_allclose(float(got), want, rtol=2e-4)

    def test_batched_is_mean_of_images(self):
        rng = np.random.default_rng(3)
        anc = _small_anchorset()
        A = anc.y1x1.shape[0]
        c_total = 6
        pconf = rng.normal(size=(2, A, c_total)).astype(np.float32)
        pyx = (rng.normal(size=(2, A, 2)) * 0.1).astype(np.float32)
        phw = (rng.normal(size=(2, A, 2)) * 0.1).astype(np.float32)
        gt = -np.ones((2, 12, 5), np.float32)
        gt[0, 0] = [20, 20, 16, 16, 1]
        gt[1, 0] = [40, 30, 20, 12, 3]
        gt[1, 1] = [12, 50, 10, 10, 0]
        singles = [
            ssd_loss_oracle(pyx[i], phw[i], pconf[i], anc, gt[i], c_total)
            for i in range(2)
        ]
        got = ssd_head.ssd_loss(jnp.asarray(pconf), jnp.asarray(pyx), jnp.asarray(phw),
                                anc, jnp.asarray(gt), c_total, neg_sel_cap=96)
        np.testing.assert_allclose(float(got), np.mean(singles), rtol=2e-4)


class TestSSDDecode:
    def test_decode_crafted_logits(self):
        anc = _small_anchorset()
        A = anc.y1x1.shape[0]
        c_total = 6
        pconf = np.zeros((A, c_total), np.float32)
        pconf[:, -1] = 5.0  # default background everywhere
        # anchor 10 strongly class 2, anchor 40 strongly class 0
        pconf[10] = [0, 0, 8, 0, 0, 0]
        pconf[40] = [8, 0, 0, 0, 0, 0]
        pyx = np.zeros((A, 2), np.float32)
        phw = np.zeros((A, 2), np.float32)
        scores, boxes, cid, valid, _ = ssd_head.ssd_decode(
            jnp.asarray(pconf), jnp.asarray(pyx), jnp.asarray(phw), anc,
            score_threshold=0.5, iou_threshold=0.45, max_boxes=4, pre_topk=16,
        )
        valid = np.asarray(valid)
        assert valid.sum() == 2
        got_cid = np.asarray(cid)[valid]
        np.testing.assert_array_equal(np.sort(got_cid), [0, 2])
        # zero offsets decode to the anchor boxes themselves
        got_boxes = np.asarray(boxes)[valid]
        anc_corners = np.concatenate([np.asarray(anc.y1x1), np.asarray(anc.y2x2)], -1)
        for row, ci in zip(got_boxes, got_cid):
            src = anc_corners[10 if ci == 2 else 40]
            np.testing.assert_allclose(row, src, atol=1e-3)


class TinySSD(ssd_head.SSDNet):
    pass


def test_ssd_model_end_to_end(tmp_path):
    """Tiny-input SSD300 subclass: a few train steps run, loss finite and decreasing,
    inference + save/load round-trip."""
    from tpudet.models.ssd import SSD300

    class SSD64(SSD300):
        input_size = 64

    config = {
        "mode": "train",
        "data_format": "channels_last",
        "num_classes": 4,
        "weight_decay": 1e-4,
        "keep_prob": 1.0,
        "batch_size": 2,
        "nms_score_threshold": 0.3,
        "nms_max_boxes": 5,
        "nms_iou_threshold": 0.45,
        "pretraining_weight": None,
        "hard_neg_cap": 64,
        "nms_pre_topk": 32,
    }

    rng = np.random.default_rng(0)

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 8, 5), np.float32)
            gt[:, 0] = [32, 32, 20, 24, 1]
            yield images, gt

    provider = {
        "data_shape": [64, 64, 3],
        "num_train": 6,
        "num_val": 0,
        "train_generator": (lambda: None, batches()),
        "val_generator": None,
    }
    model = SSD64(config, provider)
    l1 = model.train_one_epoch(0.01)
    assert np.isfinite(l1)
    l2 = model.train_one_epoch(0.01)
    assert np.isfinite(l2)

    result = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(result) == 3
    scores, bbox, cid = result
    assert bbox.shape[1:] == (4,) and scores.shape == cid.shape

    model.save_weight("latest", str(tmp_path / "ssd" / "test"))
    model2 = SSD64(config, provider)
    model2.load_weight(str(tmp_path / "ssd" / "test"))
    assert model2.global_step == model.global_step
    r2 = model2.test_one_image(np.zeros((1, 64, 64, 3), np.float32))
    r1 = model.test_one_image(np.zeros((1, 64, 64, 3), np.float32))
    np.testing.assert_allclose(r1[0], r2[0], rtol=1e-5)


def test_ssd_model_channels_first_matches_channels_last():
    """data_format='channels_first' end-to-end at the MODEL level (SSD300.py:53-60):
    same seed + same data (NCHW-transposed) must give the identical train loss and
    identical detections as the channels_last run. The reference threads the format
    through every layer; tpudet transposes at the model edge (models/base.py) and
    computes NHWC (the TPU-native layout) — this test pins that contract."""
    from tpudet.models.ssd import SSD300

    class SSD64(SSD300):
        input_size = 64

    def build(data_format):
        rng = np.random.default_rng(3)
        images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
        gt = -np.ones((2, 8, 5), np.float32)
        gt[:, 0] = [32, 32, 20, 24, 1]
        feed = images.transpose(0, 3, 1, 2) if data_format == "channels_first" \
            else images

        def batches():
            while True:
                yield feed, gt

        config = {
            "mode": "train", "data_format": data_format, "num_classes": 4,
            "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
            "nms_score_threshold": 0.3, "nms_max_boxes": 5,
            "nms_iou_threshold": 0.45, "pretraining_weight": None,
            "hard_neg_cap": 64, "nms_pre_topk": 32, "seed": 11,
        }
        provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                    "train_generator": (lambda: None, batches()),
                    "val_generator": None}
        return SSD64(config, provider), images

    m_last, images = build("channels_last")
    m_first, _ = build("channels_first")
    l_last = m_last.train_one_epoch(0.01)
    l_first = m_first.train_one_epoch(0.01)
    assert np.isfinite(l_first)
    np.testing.assert_allclose(l_first, l_last, rtol=1e-6)

    test_img = images[:1]
    r_last = m_last.test_one_image(test_img)
    r_first = m_first.test_one_image(test_img.transpose(0, 3, 1, 2))
    for a, b in zip(r_last, r_first):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
