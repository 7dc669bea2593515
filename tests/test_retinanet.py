"""RetinaNet parity + smoke tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet.heads import retina as retina_head
import oracles


def _anchors():
    return retina_head.build_anchors(64, [(4, 4), (2, 2)], areas=[16.0, 32.0])


def retina_loss_oracle(pyx, phw, pconf, anc, gt_padded, c_total, alpha, gamma):
    """NumPy transcription of RetinaNet.py:357-474."""
    col = gt_padded[:, 0]
    n = int(np.argmin(col)) if (col < 0).any() else len(col)
    gt = gt_padded[:n]
    gyx, ghw, label = gt[:, 0:2], gt[:, 2:4], gt[:, 4].astype(int)
    a_y1x1, a_y2x2 = np.asarray(anc.y1x1), np.asarray(anc.y2x2)
    a_yx, a_hw = np.asarray(anc.yx), np.asarray(anc.hw)
    A = a_y1x1.shape[0]
    iou = oracles.iou_matrix(gyx - ghw / 2, gyx + ghw / 2, a_y1x1, a_y2x2)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def focal(prob_rows, labels):
        p = np.clip(prob_rows[np.arange(len(labels)), labels], 1e-8, 1.0)
        return -alpha * (1 - p) ** gamma * np.log(p)

    best = iou.argmax(1)
    bestmask = np.zeros(A, bool)
    bestmask[np.unique(best)] = True
    other = ~bestmask
    agiou = iou.T
    best_ag, rg = agiou.max(1), agiou.argmax(1)
    pos = other & (best_ag > 0.5)
    neg = other & (best_ag < 0.4)

    probs = softmax(pconf)
    pos_rows = np.concatenate([best, np.where(pos)[0]])
    pos_labels = np.concatenate([label, label[rg[pos]]])
    neg_rows = np.where(neg)[0]
    conf = (focal(probs[pos_rows], pos_labels).sum()
            + focal(probs[neg_rows], np.full(len(neg_rows), c_total - 1)).sum())
    num_pos = len(pos_rows)
    conf /= num_pos

    g_yx_rows = np.concatenate([gyx, gyx[rg[pos]]])
    g_hw_rows = np.concatenate([ghw, ghw[rg[pos]]])
    a_yx_rows = np.concatenate([a_yx[best], a_yx[pos]])
    a_hw_rows = np.concatenate([a_hw[best], a_hw[pos]])
    p_yx_rows = np.concatenate([pyx[best], pyx[pos]])
    p_hw_rows = np.concatenate([phw[best], phw[pos]])
    tyx = (g_yx_rows - a_yx_rows) / a_hw_rows
    thw = np.log(g_hw_rows / a_hw_rows)
    coord = (oracles.smooth_l1(p_yx_rows - tyx).sum(-1)
             + oracles.smooth_l1(p_hw_rows - thw).sum(-1)).mean()
    return conf + coord


class TestRetinaLossParity:
    @pytest.mark.parametrize("seed,ngt", [(0, 1), (1, 4)])
    def test_matches_oracle(self, seed, ngt):
        rng = np.random.default_rng(seed)
        anc = _anchors()
        A = anc.y1x1.shape[0]
        c_total = 5
        pconf = rng.normal(size=(A, c_total)).astype(np.float32)
        pyx = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        phw = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        gt = -np.ones((10, 5), np.float32)
        for i in range(ngt):
            yx = rng.uniform(12, 52, 2)
            hw = rng.uniform(8, 30, 2)
            gt[i] = [yx[0], yx[1], hw[0], hw[1], rng.integers(0, c_total - 1)]
        want = retina_loss_oracle(pyx, phw, pconf, anc, gt, c_total, 0.25, 2.0)
        got = retina_head.retina_loss(
            jnp.asarray(pconf)[None], jnp.asarray(pyx)[None], jnp.asarray(phw)[None],
            anc, jnp.asarray(gt)[None], c_total, 0.25, 2.0)
        np.testing.assert_allclose(float(got), want, rtol=2e-4)

    def test_anchor_layout(self):
        anc = _anchors()
        assert anc.y1x1.shape[0] == (16 + 4) * 9
        # first cell center at (8, 8) for 4x4 grid over 64 px
        hw0 = np.asarray(anc.hw)[0]
        np.testing.assert_allclose(hw0, [16, 16], atol=1e-4)  # ratio 1, mult 2^0
        hw1 = np.asarray(anc.hw)[1]
        np.testing.assert_allclose(hw1, [16 * 2 ** (1 / 3)] * 2, rtol=1e-5)


def _detection_config(mode="train"):
    return {
        "mode": mode,
        "data_format": "channels_last",
        "num_classes": 4,
        "weight_decay": 1e-4,
        "keep_prob": 1.0,
        "batch_size": 2,
        "nms_score_threshold": 0.3,
        "nms_max_boxes": 5,
        "nms_iou_threshold": 0.45,
        "data_shape": [64, 64, 3],
        "is_bottleneck": True,
        "residual_block_list": [1, 1, 1],
        "init_conv_filters": 8,
        "is_pretraining": False,
        "alpha": 0.25,
        "gamma": 2.0,
        "nms_pre_topk": 32,
    }


def test_retinanet_detection_end_to_end(tmp_path):
    from tpudet.models.retinanet import RetinaNet

    rng = np.random.default_rng(0)

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 8, 5), np.float32)
            gt[:, 0] = [32, 32, 24, 24, 2]
            yield images, gt

    provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    model = RetinaNet(_detection_config(), provider)
    loss = model.train_one_epoch(0.01)
    assert np.isfinite(loss)
    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3


def test_retinanet_pretraining_and_transfer(tmp_path):
    from tpudet.models.retinanet import RetinaNet

    rng = np.random.default_rng(1)
    cfg = _detection_config()
    cfg["is_pretraining"] = True

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            labels = rng.integers(0, 5, 2)
            yield images, labels

    provider = {"data_shape": [64, 64, 3], "num_train": 4, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    pre = RetinaNet(cfg, provider)
    loss, acc = pre.train_one_epoch(0.01)
    assert np.isfinite(loss) and 0.0 <= acc <= 1.0
    pred = pre.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert pred.shape == (1,)
    pre.save_weight("latest", str(tmp_path / "pre" / "ckpt"))

    det_cfg = _detection_config()

    def det_batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 8, 5), np.float32)
            gt[:, 0] = [32, 32, 24, 24, 2]
            yield images, gt

    det_provider = {"data_shape": [64, 64, 3], "num_train": 2, "num_val": 0,
                    "train_generator": (lambda: None, det_batches()),
                    "val_generator": None}
    det = RetinaNet(det_cfg, det_provider)
    det.load_pretraining_weight(str(tmp_path / "pre" / "ckpt"))
    # backbone weights must now match the pretrained ones
    import jax

    pre_kernel = jax.tree.leaves(pre.params["feature_extractor"]["backbone"])[0]
    det_kernel = jax.tree.leaves(det.params["feature_extractor"]["backbone"])[0]
    np.testing.assert_allclose(np.asarray(pre_kernel), np.asarray(det_kernel))
    loss = det.train_one_epoch(0.01)
    assert np.isfinite(loss)
