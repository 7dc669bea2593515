"""Light-Head R-CNN: RoI-align parity vs TF crop_and_resize, sampling behavior,
alternating-phase training smoke test."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudet.heads import lhrcnn as lh
from tpudet.ops import roi


class TestCropAndResize:
    def test_matches_tf(self):
        tf = pytest.importorskip("tensorflow")
        rng = np.random.default_rng(0)
        feat = rng.normal(size=(9, 11, 5)).astype(np.float32)
        boxes = np.asarray([
            [0.1, 0.2, 0.6, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [0.4, 0.4, 0.45, 0.5],
            [-0.1, 0.2, 0.5, 1.2],  # out-of-range extrapolation
        ], np.float32)
        want = tf.image.crop_and_resize(
            feat[None], boxes, np.zeros(len(boxes), np.int32), [7, 7]).numpy()
        got = np.asarray(roi.crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), 7))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)



    def test_mm_impl_matches_gather(self):
        """The TPU matmul formulation == the gather formulation (values AND
        gradients), incl. border clips and out-of-frame extrapolation zeros."""
        import jax
        from tpudet.ops.roi import _crop_gather, _crop_mm

        rng = np.random.default_rng(3)
        feat = jnp.asarray(rng.normal(size=(22, 35, 16)).astype(np.float32))
        boxes = np.concatenate([
            rng.uniform(-0.2, 1.2, (30, 2)),
            rng.uniform(-0.2, 1.2, (30, 2)),
        ], -1).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2])
        boxes = jnp.asarray(boxes)
        got = _crop_mm(feat, boxes, 7)
        want = _crop_gather(feat, boxes, 7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        def loss_mm(f, b):
            return jnp.sum(jnp.sin(_crop_mm(f, b, 7)))

        def loss_g(f, b):
            return jnp.sum(jnp.sin(_crop_gather(f, b, 7)))

        gm = jax.grad(loss_mm, argnums=(0, 1))(feat, boxes)
        gg = jax.grad(loss_g, argnums=(0, 1))(feat, boxes)
        for a, b_ in zip(gm, gg):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


class TestAnchors:
    def test_border_filter(self):
        anc, keep = lh.build_anchors(4, 4, 32.0, 128, 128)
        a_y1x1 = np.asarray(anc.y1x1)
        a_y2x2 = np.asarray(anc.y2x2)
        assert (a_y1x1 >= 0).all()
        assert (a_y2x2[:, 0] <= 126).all() and (a_y2x2[:, 1] <= 126).all()
        assert keep.sum() == a_y1x1.shape[0] and keep.sum() < 4 * 4 * 15


class TestRPNSampling:
    def test_caps_and_validity(self):
        rng = np.random.default_rng(0)
        anc, _ = lh.build_anchors(4, 4, 32.0, 128, 128)
        A = anc.y1x1.shape[0]
        pyx = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        phw = (rng.normal(size=(A, 2)) * 0.1).astype(np.float32)
        pconf = rng.normal(size=(A, 2)).astype(np.float32)
        gt = -np.ones((8, 5), np.float32)
        gt[0] = [64, 64, 40, 40, 2]
        gt[1] = [32, 96, 30, 24, 0]
        s = lh.rpn_image_loss_and_sample(jnp.asarray(pyx), jnp.asarray(phw),
                                         jnp.asarray(pconf), anc, jnp.asarray(gt))
        assert np.isfinite(float(s.rpn_loss))
        assert s.pos_proposal.shape == (lh.POS_CAP, 4)
        assert s.neg_proposal.shape == (lh.TOTAL_CAP, 4)
        n_pos = int(np.asarray(s.pos_valid).sum())
        n_neg = int(np.asarray(s.neg_valid).sum())
        assert 1 <= n_pos <= lh.POS_CAP
        assert 0 <= n_neg <= lh.TOTAL_CAP - n_pos
        labels = np.asarray(s.pos_label)[np.asarray(s.pos_valid)]
        assert set(labels.tolist()) <= {0, 2}


def test_lhrcnn_model_alternating_phases():
    from tpudet.models.lhrcnn import LHRCNN

    rng = np.random.default_rng(0)
    cfg = {
        "mode": "train", "data_format": "channels_last", "num_classes": 4,
        "weight_decay": 1e-4, "keep_prob": 1.0, "batch_size": 2,
        "data_shape": [64, 64, 3],
        "nms_score_threshold": 0.3, "nms_max_boxes": 5, "nms_iou_threshold": 0.45,
        "rpn_first_step": 1, "rcnn_first_step": 2, "rpn_second_step": 3,
        "post_nms_proposal": 20, "nms_pre_topk": 16,
    }

    def batches():
        while True:
            images = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
            gt = -np.ones((2, 6, 5), np.float32)
            gt[:, 0] = [32, 32, 30, 30, 1]
            yield images, gt

    provider = {"data_shape": [64, 64, 3], "num_train": 8, "num_val": 0,
                "train_generator": (lambda: None, batches()), "val_generator": None}
    model = LHRCNN(cfg, provider)

    import jax

    rcnn_kernel_before = np.asarray(
        jax.tree.leaves(model.params["rcnn"])[0]).copy()
    fe_kernel_before = np.asarray(
        jax.tree.leaves(model.params["feature_extractor"])[0]).copy()

    loss = model.train_one_epoch(0.001)  # steps 0..3: rpn, rcnn, rpn, rcnn
    assert np.isfinite(loss)

    rcnn_kernel_after = np.asarray(jax.tree.leaves(model.params["rcnn"])[0])
    fe_kernel_after = np.asarray(jax.tree.leaves(model.params["feature_extractor"])[0])
    # both phases must have updated their own scopes
    assert not np.allclose(rcnn_kernel_before, rcnn_kernel_after)
    assert not np.allclose(fe_kernel_before, fe_kernel_after)

    res = model.test_one_image(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    assert len(res) == 3
