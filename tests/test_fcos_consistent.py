"""Opt-in FCOS ``consistent_objective`` (the Q-FCOS-objective counterfactual).

The default FCOS loss/decode stay reference-exact (scripts/parity_fcos.py,
scripts/parity_loss.py, tests/test_ssd_conf_layout.py). This file validates the
opt-in standard-form objective against an independent NumPy transcription of the
FCOS paper's loss: positives-only centerness CE, 0.25/0.75 asymmetric focal,
one ÷N_pos per image — the three deliberate deviations from the reference's
FCOS.py:315-347 (every-cell centerness CE, symmetric alpha, per-level
÷sum(heat_gt)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.heads import fcos as fcos_head

STRIDES = fcos_head.STRIDES
BANDS = fcos_head.SIZE_BANDS


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _oracle_consistent(level_preds, gt, num_classes):
    """NumPy oracle of the standard FCOS objective, naive [fh, fw, G] layout."""
    n_valid = 0
    while n_valid < gt.shape[0] and gt[n_valid, 0] >= 0:
        n_valid += 1
    iou_total = heat_total = center_total = 0.0
    num_pos = 0.0
    for (pconf, preg, pcen), (lo, hi), stride in zip(level_preds, BANDS, STRIDES):
        fh, fw, C = pconf.shape
        # routed gts: size band on sqrt(area) in pixels, inclusive bounds
        dist = np.zeros((fh, fw, n_valid, 4))  # l, r, t, b
        heatmask = np.zeros((fh, fw, n_valid))
        for gi in range(n_valid):
            yc, xc, h, w, cls = gt[gi]
            size = np.sqrt(h * w)
            if not (lo <= size <= hi):
                continue
            gy1, gy2 = (yc - h / 2) / stride, (yc + h / 2) / stride
            gx1, gx2 = (xc - w / 2) / stride, (xc + w / 2) / stride
            for yy in range(fh):
                for xx in range(fw):
                    l, r = xx - gx1, gx2 - xx
                    t, b = yy - gy1, gy2 - yy
                    if l > 0 and r > 0 and t > 0 and b > 0:
                        heatmask[yy, xx, gi] = 1.0
                        dist[yy, xx, gi] = [l, r, t, b]
        loc = heatmask.max(-1) if n_valid else np.zeros((fh, fw))
        # min-area tie keeps all minima (reference equality-mask semantics)
        area = (dist[..., 0] + dist[..., 1]) * (dist[..., 2] + dist[..., 3])
        area_masked = np.where(heatmask > 0, area, 1e8)
        if n_valid:
            amin = area_masked.min(-1, keepdims=True)
            dmask = ((area == amin) & (heatmask > 0)).astype(np.float64)
            d = np.max(dist * dmask[..., None], axis=2)  # [fh, fw, 4]
        else:
            d = np.zeros((fh, fw, 4))
        dl, dr, dt, db = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
        pl, pr, pt, pb = (np.asarray(preg[..., i], np.float64) for i in range(4))
        inter = (np.minimum(dl, pl) + np.minimum(dr, pr)) * \
                (np.minimum(dt, pt) + np.minimum(db, pb))
        union = (dl + dr) * (dt + db) + (pl + pr) * (pt + pb) - inter
        iou = inter / (union + 1e-12)
        iou_total += np.sum(-np.log(iou + 1e-12) * loc)

        lr_min, lr_max = np.minimum(dl, dr), np.maximum(dl, dr)
        tb_min, tb_max = np.minimum(dt, db), np.maximum(dt, db)
        cgt = np.sqrt(lr_min * tb_min / (lr_max * tb_max + 1e-12))
        cp = np.asarray(pcen[..., 0], np.float64)
        ce = np.maximum(cp, 0) - cp * cgt + np.log1p(np.exp(-np.abs(cp)))
        center_total += np.sum(ce * loc)  # positives only

        heat_gt = np.zeros((fh, fw, C))
        for gi in range(n_valid):
            cls = int(gt[gi, 4])
            heat_gt[..., cls] = np.maximum(heat_gt[..., cls], heatmask[..., gi])
        s = _sigmoid(np.asarray(pconf, np.float64))
        pos = -0.25 * (1 - s) ** 2 * np.log(s + 1e-300) * heat_gt
        neg = -0.75 * s ** 2 * np.log(1 - s + 1e-300) * (1 - heat_gt)
        heat_total += pos.sum() + neg.sum()
        num_pos += loc.sum()
    return (iou_total + heat_total + center_total) / max(num_pos, 1.0)


def _rand_case(rng, C=6, G=8, n_objects=4):
    shapes = [(12, 16), (6, 8), (3, 4), (2, 2), (1, 1)]  # strides 8..128, 96x128 in
    level_preds = []
    for fh, fw in shapes:
        pconf = rng.normal(size=(fh, fw, C)).astype(np.float32)
        preg = np.exp(rng.normal(size=(fh, fw, 4))).astype(np.float32) * 3.0
        pcen = rng.normal(size=(fh, fw, 1)).astype(np.float32)
        level_preds.append((pconf, preg, pcen))
    gt = -np.ones((G, 5), np.float32)
    for k in range(n_objects):
        h, w = rng.uniform(20, 700, 2)
        gt[k] = [rng.uniform(h / 2, 2000 - h / 2), rng.uniform(w / 2, 2000 - w / 2),
                 h, w, rng.integers(0, C)]
    return level_preds, gt


@pytest.mark.parametrize("seed", [0, 3])
def test_consistent_loss_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    level_preds, gt = _rand_case(rng)
    want = _oracle_consistent(level_preds, gt, 6)
    got = fcos_head.fcos_image_loss(
        [tuple(jnp.asarray(t) for t in lvl) for lvl in level_preds],
        jnp.asarray(gt), 6, consistent=True)
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


def test_consistent_loss_no_positives_is_finite():
    rng = np.random.default_rng(1)
    level_preds, _ = _rand_case(rng, n_objects=0)
    gt = -np.ones((8, 5), np.float32)
    got = fcos_head.fcos_image_loss(
        [tuple(jnp.asarray(t) for t in lvl) for lvl in level_preds],
        jnp.asarray(gt), 6, consistent=True)
    assert np.isfinite(float(got))
    # no positives: only the focal negative term survives, ÷ max(N_pos, 1)
    want = _oracle_consistent(level_preds, gt, 6)
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


def test_consistent_grads_finite():
    rng = np.random.default_rng(2)
    level_preds, gt = _rand_case(rng)
    flat = [jnp.asarray(t) for lvl in level_preds for t in lvl]

    def loss(flat):
        lp = [(flat[3 * i], flat[3 * i + 1], flat[3 * i + 2]) for i in range(5)]
        return fcos_head.fcos_image_loss(lp, jnp.asarray(gt), 6, consistent=True)

    grads = jax.grad(loss)(flat)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_consistent_decode_emits_last_class():
    """Q9 drops class C-1 by default; consistent_objective emits all classes."""
    rng = np.random.default_rng(7)
    C = 4
    shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    level_preds = []
    for fh, fw in shapes:
        pconf = np.full((fh, fw, C), -8.0, np.float32)
        preg = np.full((fh, fw, 4), 2.0, np.float32)
        pcen = np.full((fh, fw, 1), 6.0, np.float32)
        level_preds.append(tuple(jnp.asarray(t) for t in (pconf, preg, pcen)))
    # one confident hit for the LAST class on level 0
    lp0 = np.array(level_preds[0][0])
    lp0[4, 4, C - 1] = 6.0
    level_preds[0] = (jnp.asarray(lp0),) + level_preds[0][1:]

    for emit_all, expect in ((False, 0), (True, 1)):
        scores, boxes, cid, valid, trunc = fcos_head.fcos_decode(
            level_preds, C, 0.3, 0.5, 4, emit_all_classes=emit_all)
        got = int(np.sum(np.asarray(valid) & (np.asarray(cid) == C - 1)))
        assert got == expect, (emit_all, got)
