"""RefineDet/PFPNet: loss parity vs NumPy oracle + model smoke tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet.heads import refine as refine_head
import oracles


def _anchors():
    return refine_head.build_anchors([(4, 4), (2, 2)], strides=[8, 16])


def refine_loss_oracle(ayx, ahw, aconf, oyx, ohw, oconf, anc, gt_padded, c_total):
    """Transcription of RefineDet.py:420-561."""
    col = gt_padded[:, 0]
    n = int(np.argmin(col)) if (col < 0).any() else len(col)
    gt = gt_padded[:n]
    gyx, ghw, label = gt[:, 0:2], gt[:, 2:4], gt[:, 4].astype(int)
    a_y1x1, a_y2x2 = np.asarray(anc.y1x1), np.asarray(anc.y2x2)
    a_yx, a_hw = np.asarray(anc.yx), np.asarray(anc.hw)
    A = a_y1x1.shape[0]
    iou = oracles.iou_matrix(gyx - ghw / 2, gyx + ghw / 2, a_y1x1, a_y2x2)

    best = iou.argmax(1)
    bestmask = np.zeros(A, bool)
    bestmask[np.unique(best)] = True
    other = ~bestmask
    agiou = iou.T
    mx, rg = agiou.max(1), agiou.argmax(1)
    pos = other & (mx > 0.5)
    neg = other & (mx < 0.4)
    pos_idx = np.where(pos)[0]
    num_pos = n + len(pos_idx)

    rows_a = np.concatenate([best, pos_idx])          # anchor index per row
    rows_g = np.concatenate([np.arange(n), rg[pos_idx]])  # gt index per row

    # ARM
    arm_conf_loss = oracles.softmax_ce(aconf[rows_a], np.zeros(num_pos, int)).mean()
    tyx = (gyx[rows_g] - a_yx[rows_a]) / a_hw[rows_a]
    thw = np.log(ghw[rows_g] / a_hw[rows_a])
    arm_coord = (oracles.smooth_l1(ayx[rows_a] - tyx).sum(-1)
                 + oracles.smooth_l1(ahw[rows_a] - thw).sum(-1)).mean()
    neg_ce = oracles.softmax_ce(aconf, np.ones(A, int))
    nidx = np.where(neg)[0]
    chosen = min(len(nidx), 3 * num_pos)
    sel = oracles.tf_nms(np.concatenate([a_y1x1, a_y2x2], -1)[nidx], neg_ce[nidx],
                         chosen, 0.7)
    sel_anchor = nidx[sel]
    neg_arm = neg_ce[sel_anchor].mean()

    # ODM
    keep = aconf[sel_anchor, 1] < 0.99  # raw logit comparison
    odm_neg_rows = sel_anchor[keep]
    neg_odm = oracles.softmax_ce(oconf[odm_neg_rows],
                                 np.full(len(odm_neg_rows), c_total - 1)).mean() \
        if len(odm_neg_rows) else 0.0
    odm_conf_loss = oracles.softmax_ce(oconf[rows_a], label[rows_g]).mean()
    arm_byx = ayx[rows_a] * a_hw[rows_a] + a_yx[rows_a]
    arm_bhw = np.exp(ahw[rows_a]) * a_hw[rows_a]
    oyx_t = (gyx[rows_g] - arm_byx) / arm_bhw
    ohw_t = np.log(ghw[rows_g] / arm_bhw)
    odm_coord = (oracles.smooth_l1(oyx[rows_a] - oyx_t).sum(-1)
                 + oracles.smooth_l1(ohw[rows_a] - ohw_t).sum(-1)).mean()
    return (neg_arm + arm_conf_loss + arm_coord) + (neg_odm + odm_conf_loss + odm_coord)


class TestRefineLossParity:
    @pytest.mark.parametrize("seed,ngt", [(0, 1), (1, 3)])
    def test_matches_oracle(self, seed, ngt):
        rng = np.random.default_rng(seed)
        anc = _anchors()
        A = anc.y1x1.shape[0]
        c_total = 5
        ayx = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        ahw = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        aconf = rng.normal(size=(A, 2)).astype(np.float32)
        oyx = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        ohw = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        oconf = rng.normal(size=(A, c_total)).astype(np.float32)
        gt = -np.ones((8, 5), np.float32)
        for i in range(ngt):
            yx = rng.uniform(6, 26, 2)
            hw = rng.uniform(8, 24, 2)
            gt[i] = [yx[0], yx[1], hw[0], hw[1], rng.integers(0, c_total - 1)]
        want = refine_loss_oracle(ayx, ahw, aconf, oyx, ohw, oconf, anc, gt, c_total)
        got = refine_head.refine_loss(
            jnp.asarray(ayx)[None], jnp.asarray(ahw)[None], jnp.asarray(aconf)[None],
            jnp.asarray(oyx)[None], jnp.asarray(ohw)[None], jnp.asarray(oconf)[None],
            anc, jnp.asarray(gt)[None], c_total, neg_sel_cap=64)
        np.testing.assert_allclose(float(got), want, rtol=3e-4)


def _model_cfg(input_size=64):
    return {
        "mode": "train", "data_format": "channels_last", "num_classes": 4,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
        "input_size": input_size,
        "nms_score_threshold": 0.1, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "pretraining_weight": None, "hard_neg_cap": 64, "nms_pre_topk": 16,
    }


def _provider(rng):
    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 6, 5), np.float32)
            gt[:, 0] = [32, 32, 24, 24, 1]
            yield images, gt

    return {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
            "train_generator": (lambda: None, batches()), "val_generator": None}


def test_refinedet_model_end_to_end():
    from tpudet.models.refinedet import RefineDet320

    rng = np.random.default_rng(0)
    model = RefineDet320(_model_cfg(), _provider(rng))
    loss = model.train_one_epoch(0.001)
    assert np.isfinite(loss)
    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3


def test_pfpnet_model_end_to_end():
    from tpudet.models.refinedet import PFPNetR

    rng = np.random.default_rng(1)
    model = PFPNetR(_model_cfg(), _provider(rng))
    loss = model.train_one_epoch(0.001)
    assert np.isfinite(loss)
    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3
