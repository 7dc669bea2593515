"""Unit tests for the shared ops layer vs NumPy oracles of the reference formulas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet.ops import anchors, boxes, losses, matching, nms
import oracles


def random_boxes(rng, n, scale=300.0):
    yx = rng.uniform(0, scale, (n, 2)).astype(np.float32)
    hw = rng.uniform(5, scale / 2, (n, 2)).astype(np.float32)
    return yx - hw / 2, yx + hw / 2, yx, hw


class TestBoxes:
    def test_center_corner_roundtrip(self, rng):
        y1x1, y2x2, yx, hw = random_boxes(rng, 17)
        cyx, chw = boxes.corners_to_center(jnp.asarray(y1x1), jnp.asarray(y2x2))
        np.testing.assert_allclose(cyx, yx, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(chw, hw, rtol=1e-5, atol=1e-4)
        c1, c2 = boxes.center_to_corners(jnp.asarray(yx), jnp.asarray(hw))
        np.testing.assert_allclose(c1, y1x1, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(c2, y2x2, rtol=1e-5, atol=1e-4)

    def test_pairwise_iou_matches_oracle(self, rng):
        g1, g2, _, _ = random_boxes(rng, 8)
        a1, a2, _, _ = random_boxes(rng, 23)
        got = boxes.pairwise_iou(jnp.asarray(g1), jnp.asarray(g2), jnp.asarray(a1), jnp.asarray(a2))
        want = oracles.iou_matrix(g1, g2, a1, a2)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_encode_decode_roundtrip(self, rng):
        _, _, gyx, ghw = random_boxes(rng, 11)
        _, _, ayx, ahw = random_boxes(rng, 11)
        tyx, thw = boxes.encode(jnp.asarray(gyx), jnp.asarray(ghw), jnp.asarray(ayx), jnp.asarray(ahw))
        byx, bhw = boxes.decode(tyx, thw, jnp.asarray(ayx), jnp.asarray(ahw))
        np.testing.assert_allclose(np.asarray(byx), gyx, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(bhw), ghw, rtol=1e-4, atol=1e-3)


class TestAnchors:
    def test_ssd300_anchor_set(self):
        feat_shapes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
        ratios = [[2, 1 / 2], [2, 1 / 2, 3, 1 / 3], [2, 1 / 2, 3, 1 / 3],
                  [2, 1 / 2, 3, 1 / 3], [2, 1 / 2], [2, 1 / 2]]
        pairs = anchors.ssd_scale_pairs(300.0, 6)
        levels = []
        for (fh, fw), pair, ars in zip(feat_shapes, pairs, ratios):
            priors = anchors.ssd_priors(pair, ars)
            levels.append(anchors.grid_anchors(fh, fw, priors, 300.0 / fh, 300.0 / fw))
        y1x1, y2x2, yx, hw = anchors.concat_levels(levels)
        assert y1x1.shape[0] == 8732  # the canonical SSD300 anchor count
        o1, o2, oyx, ohw = oracles.ssd_anchors(300.0, feat_shapes)
        np.testing.assert_allclose(y1x1, o1, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(y2x2, o2, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(yx, oyx, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(hw, ohw, rtol=1e-5, atol=1e-3)

    def test_scale_values(self):
        pairs = anchors.ssd_scale_pairs(300.0, 6)
        # s_1 = 0.2*300 = 60 ... s_6 = 0.9*300 = 270 (SSD300.py:112)
        np.testing.assert_allclose(pairs[0][0], 0.2 * 300, rtol=1e-6)
        np.testing.assert_allclose(pairs[5][0], 0.9 * 300, rtol=1e-6)


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_greedy_matches_tf_semantics(self, seed):
        rng = np.random.default_rng(seed)
        n = 64
        y1x1, y2x2, _, _ = random_boxes(rng, n, scale=100.0)
        b = np.concatenate([y1x1, y2x2], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        for thr, max_out in [(0.5, 10), (0.7, 30), (0.3, 64)]:
            want = oracles.tf_nms(b, scores, max_out, thr)
            idx, valid = jax.jit(nms.greedy_nms, static_argnums=(2,))(
                jnp.asarray(b), jnp.asarray(scores), max_out, thr
            )
            got = np.asarray(idx)[np.asarray(valid)]
            np.testing.assert_array_equal(got, want)

    def test_active_mask_and_num_select(self):
        rng = np.random.default_rng(0)
        n = 32
        y1x1, y2x2, _, _ = random_boxes(rng, n, scale=100.0)
        b = np.concatenate([y1x1, y2x2], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        active = np.zeros(n, bool)
        active[: n // 2] = True
        want = oracles.tf_nms(b[: n // 2], scores[: n // 2], 5, 0.6)
        idx, valid = nms.greedy_nms(
            jnp.asarray(b), jnp.asarray(scores), 16, 0.6,
            active=jnp.asarray(active), num_select=jnp.int32(5),
        )
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, want)

    def test_per_class_nms_shapes_and_validity(self):
        rng = np.random.default_rng(1)
        n, c = 50, 4
        y1x1, y2x2, _, _ = random_boxes(rng, n, scale=100.0)
        b = np.concatenate([y1x1, y2x2], -1).astype(np.float32)
        cs = rng.uniform(0, 1, (c, n)).astype(np.float32)
        sb, ss, sv, _tr = nms.per_class_nms(jnp.asarray(b), jnp.asarray(cs), 0.5, 32, 8, 0.5)
        assert sb.shape == (c, 8, 4) and ss.shape == (c, 8) and sv.shape == (c, 8)
        # every valid score passes threshold, per class equal to oracle on filtered set
        for ci in range(c):
            keep = cs[ci] >= 0.5
            want_idx = oracles.tf_nms(b[keep], cs[ci][keep], 8, 0.5)
            want_scores = cs[ci][keep][want_idx]
            got_scores = np.asarray(ss[ci])[np.asarray(sv[ci])]
            np.testing.assert_allclose(np.sort(got_scores), np.sort(want_scores), rtol=1e-6)


class TestMatching:
    def test_valid_gt_count(self):
        gt = -np.ones((60, 5), np.float32)
        gt[:7] = np.abs(np.random.default_rng(0).normal(size=(7, 5))) + 1
        assert int(matching.valid_gt_count(jnp.asarray(gt))) == 7
        full = np.abs(np.random.default_rng(1).normal(size=(60, 5))).astype(np.float32) + 1
        assert int(matching.valid_gt_count(jnp.asarray(full))) == 60

    def test_scatter_best_mask(self):
        best = jnp.asarray([3, 3, 7, 1], jnp.int32)
        valid = jnp.asarray([True, True, True, False])
        mask = matching.scatter_best_mask(best, valid, 10)
        want = np.zeros(10, bool)
        want[[3, 7]] = True
        np.testing.assert_array_equal(np.asarray(mask), want)

    def test_best_gt_per_anchor_ignores_padding(self):
        iou = jnp.asarray([[0.9, 0.1], [0.2, 0.8], [0.99, 0.99]])
        valid = jnp.asarray([True, True, False])
        best_iou, best_idx = matching.best_gt_per_anchor(iou, valid)
        np.testing.assert_allclose(np.asarray(best_iou), [0.9, 0.8])
        np.testing.assert_array_equal(np.asarray(best_idx), [0, 1])


class TestLosses:
    def test_smooth_l1(self, rng):
        x = rng.normal(size=(100,)).astype(np.float32) * 2
        np.testing.assert_allclose(
            np.asarray(losses.smooth_l1(jnp.asarray(x))), oracles.smooth_l1(x), rtol=1e-6
        )

    def test_softmax_ce(self, rng):
        logits = rng.normal(size=(12, 21)).astype(np.float32)
        labels = rng.integers(0, 21, 12)
        got = losses.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
        np.testing.assert_allclose(np.asarray(got), oracles.softmax_ce(logits, labels), rtol=1e-4, atol=1e-4)

    def test_sigmoid_ce_matches_formula(self, rng):
        x = rng.normal(size=(50,)).astype(np.float64) * 3
        z = rng.uniform(0, 1, 50)
        want = -(z * np.log(1 / (1 + np.exp(-x))) + (1 - z) * np.log(1 - 1 / (1 + np.exp(-x))))
        got = losses.sigmoid_cross_entropy(
            jnp.asarray(x, jnp.float32), jnp.asarray(z, jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_neg_log_iou_perfect_match_is_zero(self):
        t = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        assert abs(float(losses.neg_log_iou(t, t)[0])) < 1e-5

    def test_penalty_reduced_focal_shapes(self):
        s = jnp.full((4, 4), 0.5)
        g = jnp.zeros((4, 4)).at[1, 1].set(1.0)
        pos = g >= 1.0
        out = losses.penalty_reduced_focal(s, g, pos)
        assert out.shape == (4, 4)
        assert float(out[1, 1]) == pytest.approx(-np.square(0.5) * np.log(0.5), rel=1e-4)
