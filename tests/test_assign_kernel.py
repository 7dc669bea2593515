"""assign_anchors_pallas (interpret mode) vs the vmapped XLA matching ops.

The kernel must reproduce matching.{best_anchor_per_gt, best_gt_per_anchor,
scatter_best_mask} on masked_iou_matrix BIT-FOR-BIT, including both tie-break
directions and invalid-gt handling, because the anchor heads' loss-scalar
parity vs the running reference (tests/test_reference_parity.py) hangs off
these decisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.ops import matching
from tpudet.ops.pallas.assign_kernel import assign_anchors_pallas


def _xla_reference(gt_batch, a_y1x1, a_y2x2):
    def one(gt, ay1, ay2):
        g = matching.unpack_gt(gt)
        iou = matching.masked_iou_matrix(g, ay1, ay2)
        ba = matching.best_anchor_per_gt(iou)
        bi, rg = matching.best_gt_per_anchor(iou, g.valid)
        bs = matching.scatter_best_mask(ba, g.valid, ay1.shape[0])
        return ba, bi, rg, bs

    if a_y1x1.ndim == 2:
        return jax.vmap(lambda gt: one(gt, a_y1x1, a_y2x2))(gt_batch)
    return jax.vmap(one)(gt_batch, a_y1x1, a_y2x2)


def _gt_corners(gt_batch):
    yx, hw = gt_batch[..., 0:2], gt_batch[..., 2:4]
    return yx - hw / 2.0, yx + hw / 2.0


def _rand_gt(rng, b, g, n_valid_max, size=300.0):
    gt = -np.ones((b, g, 5), np.float32)
    for i in range(b):
        n = rng.integers(0, n_valid_max + 1)
        for k in range(n):
            h = rng.uniform(8, size * 0.7)
            w = rng.uniform(8, size * 0.7)
            gt[i, k] = [rng.uniform(h / 2, size - h / 2),
                        rng.uniform(w / 2, size - w / 2), h, w,
                        rng.integers(0, 20)]
    return jnp.asarray(gt)


def _rand_anchors(rng, a, size=300.0):
    yx = rng.uniform(0, size, (a, 2)).astype(np.float32)
    hw = rng.uniform(8, size / 2, (a, 2)).astype(np.float32)
    return (jnp.asarray(yx - hw / 2), jnp.asarray(yx + hw / 2))


def _check(gt, ay1, ay2):
    gy1, gy2 = _gt_corners(gt)
    valid = jax.vmap(lambda t: jnp.arange(t.shape[0]) <
                     matching.valid_gt_count(t))(gt)
    got = assign_anchors_pallas(gy1, gy2, valid, ay1, ay2, interpret=True)
    want = _xla_reference(gt, ay1, ay2)
    names = ["best_anchor", "best_iou", "rg", "best_set"]
    for n, gval, wval in zip(names, got, want):
        np.testing.assert_array_equal(np.asarray(gval), np.asarray(wval),
                                      err_msg=n)


class TestAssignKernel:
    def test_random_shared_anchors(self):
        rng = np.random.default_rng(0)
        gt = _rand_gt(rng, 5, 60, 6)
        ay1, ay2 = _rand_anchors(rng, 333)  # non-multiple of 128
        _check(gt, ay1, ay2)

    def test_dense_gt_pad60_full(self):
        rng = np.random.default_rng(1)
        gt = _rand_gt(rng, 3, 60, 60)
        ay1, ay2 = _rand_anchors(rng, 640)
        _check(gt, ay1, ay2)

    def test_no_valid_gt_image(self):
        rng = np.random.default_rng(2)
        gt = _rand_gt(rng, 4, 24, 4)
        gt = gt.at[2].set(-1.0)  # image 2: zero objects
        ay1, ay2 = _rand_anchors(rng, 256)
        _check(gt, ay1, ay2)

    def test_exact_ties_break_low(self):
        # duplicate anchors -> per-gt tie must pick the LOWEST anchor index;
        # duplicate gts -> per-anchor tie must pick the LOWEST gt index
        gt = jnp.asarray([[[50, 50, 20, 20, 3],
                           [50, 50, 20, 20, 5],
                           [-1, -1, -1, -1, -1],
                           [-1, -1, -1, -1, -1],
                           [-1, -1, -1, -1, -1],
                           [-1, -1, -1, -1, -1],
                           [-1, -1, -1, -1, -1],
                           [-1, -1, -1, -1, -1]]], jnp.float32)
        anc = np.tile(np.asarray([[40, 40, 60, 60]], np.float32), (140, 1))
        ay1 = jnp.asarray(anc[:, :2])
        ay2 = jnp.asarray(anc[:, 2:])
        _check(gt, ay1, ay2)

    def test_per_image_boxes(self):
        # RefineDet second stage: refined anchors differ per image
        rng = np.random.default_rng(3)
        gt = _rand_gt(rng, 4, 24, 5)
        boxes = []
        for _ in range(4):
            b1, b2 = _rand_anchors(rng, 200)
            boxes.append((b1, b2))
        ay1 = jnp.stack([b[0] for b in boxes])
        ay2 = jnp.stack([b[1] for b in boxes])
        _check(gt, ay1, ay2)

    def test_zero_area_gt_with_lane_padding(self):
        # A valid gt whose h (or w) clipped to 0, with A not a multiple of 128:
        # the kernel's zero-area lane-padding anchors give inter=0 and union=0
        # -> 0/0 without the denominator clamp; the NaN row would poison
        # row_max and push best_anchor to 2^30 while XLA returns 0.
        rng = np.random.default_rng(5)
        gt = _rand_gt(rng, 3, 24, 4)
        gt = gt.at[0, 0].set(jnp.asarray([120.0, 80.0, 0.0, 40.0, 7.0]))
        gt = gt.at[1, 1].set(jnp.asarray([10.0, 10.0, 0.0, 0.0, 2.0]))
        ay1, ay2 = _rand_anchors(rng, 333)  # 333 % 128 != 0 -> padded lanes
        _check(gt, ay1, ay2)

    def test_ssd300_scale(self):
        rng = np.random.default_rng(4)
        gt = _rand_gt(rng, 8, 60, 6)
        ay1, ay2 = _rand_anchors(rng, 8828)
        _check(gt, ay1, ay2)
