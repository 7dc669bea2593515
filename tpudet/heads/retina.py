"""RetinaNet head: FPN anchor subnets + focal loss (reference: RetinaNet.py).

Assignment mirrors the SSD head's fixed-shape machinery (tpudet/heads/ssd.py) with the
RetinaNet deltas (RetinaNet.py:357-474):
  * positives: best-anchor-per-gt rows + other anchors with best IoU > 0.5;
  * negatives: other anchors with best IoU < 0.4 (the 0.4-0.5 band is ignored);
  * confidence loss: softmax focal ``-alpha (1-p)^gamma log p`` on positives AND
    negatives, summed and divided by the positive-row count;
  * coordinate loss: mean smooth-L1 over positive rows;
  * no hard-negative mining.

Anchors (RetinaNet.py:328-355): 9 per cell — ratio-major {1, 1/2, 2} x size-multiplier
{2^0, 2^(1/3), 2^(2/3)} on base areas {32, 64, 128, 256, 512}; the per-cell pixel pitch
is ``input_h / feat_h`` for BOTH axes (reference uses the height-derived rate for x
too). Decode + per-class NMS are shared with SSD (identical math, SSD300.py:156-190 ==
RetinaNet.py:223-256).
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import BNActConv
from tpudet.ops import anchors as anchor_ops
from tpudet.ops import boxes as box_ops
from tpudet.ops import losses as loss_ops
from tpudet.ops import matching
from tpudet.heads.ssd import AnchorSet

ANCHOR_AREAS = (32.0, 64.0, 128.0, 256.0, 512.0)
ASPECT_RATIOS = (1.0, 1.0 / 2.0, 2.0)
SIZE_MULTIPLIERS = (2 ** 0, 2 ** (1 / 3), 2 ** (2 / 3))
NUM_ANCHORS = len(ASPECT_RATIOS) * len(SIZE_MULTIPLIERS)


def build_anchors(input_h: int, feat_shapes: Sequence[Sequence[int]],
                  areas: Sequence[float] = ANCHOR_AREAS) -> AnchorSet:
    levels = []
    for (fh, fw), area in zip(feat_shapes, areas):
        priors = anchor_ops.retina_priors(area, ASPECT_RATIOS, SIZE_MULTIPLIERS)
        rate = input_h / fh  # height-derived pitch for both axes (RetinaNet.py:331)
        levels.append(anchor_ops.grid_anchors(fh, fw, priors, rate, rate))
    arrs = anchor_ops.concat_levels(levels)
    return AnchorSet(*(jnp.asarray(a) for a in arrs))


class RetinaSubnets(nn.Module):
    """Per-level class/box towers of 4 pre-act convs + prediction conv; structure
    shared, weights NOT shared across levels (RetinaNet.py:145-155). Class prediction
    bias starts at ``-log((1-pi)/pi)``, pi = 0.01 (RetinaNet.py:47-48, 609-618)."""

    num_classes_total: int
    feature_size: int = 256
    pi: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, levels, train: bool):
        preds = []
        bias0 = -math.log((1.0 - self.pi) / self.pi)
        for i, f in enumerate(levels):
            c = f
            for j in range(4):
                c = BNActConv(self.feature_size, 3, 1, dtype=self.dtype,
                              name=f"cls{i}_conv{j}")(c, train)
            predc = BNActConv(self.num_classes_total * NUM_ANCHORS, 3, 1,
                              bias_init_const=bias0, dtype=self.dtype,
                              name=f"cls{i}_pred")(c, train)
            r = f
            for j in range(4):
                r = BNActConv(self.feature_size, 3, 1, dtype=self.dtype,
                              name=f"box{i}_conv{j}")(r, train)
            predr = BNActConv(4 * NUM_ANCHORS, 3, 1, dtype=self.dtype,
                              name=f"box{i}_pred")(r, train)
            preds.append((predc, predr))
        return preds


def flatten_preds(preds, num_classes_total: int):
    """[(predc, predr)] per level -> (pconf [B,A,C+1], pyx, phw)."""
    confs, yxs, hws = [], [], []
    for predc, predr in preds:
        b = predc.shape[0]
        pc = predc.reshape(b, -1, num_classes_total)
        pr = predr.reshape(b, -1, 4)
        confs.append(pc)
        yxs.append(pr[..., :2])
        hws.append(pr[..., 2:])
    return (jnp.concatenate(confs, 1).astype(jnp.float32),
            jnp.concatenate(yxs, 1).astype(jnp.float32),
            jnp.concatenate(hws, 1).astype(jnp.float32))


def _focal_rowwise(pconf, labels, alpha, gamma):
    p = jax.nn.softmax(pconf, axis=-1)
    p = jnp.clip(jnp.take_along_axis(p, labels[..., None], axis=-1)[..., 0], 1e-8, 1.0)
    return -alpha * jnp.power(1.0 - p, gamma) * jnp.log(p)


def _focal_from_logp(logp, alpha, gamma):
    p = jnp.clip(jnp.exp(logp), 1e-8, 1.0)
    return -alpha * jnp.power(1.0 - p, gamma) * jnp.log(p)


def _conf_focal_terms(pconf, best_anchor, g_label, rg_label, num_classes_total: int,
                      alpha, gamma):
    """The three focal readouts (per-gt best-anchor, per-anchor assigned-label,
    per-anchor background) off the [A, C] class logits.

    Default ``ca`` layout: ONE log-softmax in [C, A] (classes on sublanes, the
    ~49k anchors on lanes) serves all three terms, instead of three separate
    softmaxes over [A, C=21] whose minor class axis pads to 128 TPU lanes (6.1x
    HBM waste per materialization, fwd and bwd) — the same lever that took the
    SSD300 bench +8.4% (heads/ssd.py:_conf_ce_terms, BASELINE.md round-4 perf
    note). ``TPUDET_SSD_CONF_LAYOUT=ac`` reverts to the reference-shaped form;
    values agree to fp reduction order (tests/test_ssd_conf_layout.py)."""
    if os.environ.get("TPUDET_SSD_CONF_LAYOUT", "ca") == "ca":
        c = num_classes_total
        pconf_ca = pconf.T  # [C, A]
        m = jnp.max(pconf_ca, axis=0)
        logz = m + jnp.log(jnp.sum(jnp.exp(pconf_ca - m[None, :]), axis=0))
        log_probs_ca = pconf_ca - logz[None, :]
        cls_plane = jnp.arange(c, dtype=jnp.int32)[:, None]
        po_logp = jnp.sum(
            jnp.where(rg_label[None, :].astype(jnp.int32) == cls_plane,
                      log_probs_ca, 0.0), axis=0)
        po_focal = _focal_from_logp(po_logp, alpha, gamma)
        bg_focal = _focal_from_logp(log_probs_ca[c - 1], alpha, gamma)
        a = pconf.shape[0]
        best_oh = (
            best_anchor[:, None] == jnp.arange(a, dtype=best_anchor.dtype)
        ).astype(jnp.float32)  # [G, A]
        best_lp = jnp.einsum("ga,ca->gc", best_oh, log_probs_ca,
                             precision=jax.lax.Precision.HIGHEST)
        best_logp = jnp.take_along_axis(
            best_lp, g_label[..., None].astype(jnp.int32), axis=-1)[..., 0]
        best_focal = _focal_from_logp(best_logp, alpha, gamma)
        return best_focal, po_focal, bg_focal
    a = pconf.shape[0]
    best_focal = _focal_rowwise(pconf[best_anchor], g_label, alpha, gamma)
    po_focal = _focal_rowwise(pconf, rg_label, alpha, gamma)
    bg_focal = _focal_rowwise(
        pconf, jnp.full((a,), num_classes_total - 1, jnp.int32), alpha, gamma)
    return best_focal, po_focal, bg_focal


def _image_loss(pyx, phw, pconf, anc: AnchorSet, gt, assign,
                num_classes_total: int, alpha: float, gamma: float):
    g = matching.unpack_gt(gt)
    best_anchor, best_agiou, rg, best_set = assign

    vmask = g.valid.astype(jnp.float32)
    t_yx, t_hw = box_ops.encode(g.yx, jnp.maximum(g.hw, 1e-8),
                                anc.yx[best_anchor], anc.hw[best_anchor])
    best_coord = (jnp.sum(loss_ops.smooth_l1(pyx[best_anchor] - t_yx), -1)
                  + jnp.sum(loss_ops.smooth_l1(phw[best_anchor] - t_hw), -1))

    other = jnp.logical_not(best_set)
    pos = jnp.logical_and(other, best_agiou > 0.5)
    neg = jnp.logical_and(other, best_agiou < 0.4)
    pos_f = pos.astype(jnp.float32)
    neg_f = neg.astype(jnp.float32)

    rg_label, rg_yx, rg_hw = matching.gather_gt_rows(rg, g.label, g.yx, g.hw)
    best_focal, po_focal, bg_focal = _conf_focal_terms(
        pconf, best_anchor, g.label, rg_label, num_classes_total, alpha, gamma)
    po_t_yx, po_t_hw = box_ops.encode(rg_yx, jnp.maximum(rg_hw, 1e-8),
                                      anc.yx, anc.hw)
    po_coord = (jnp.sum(loss_ops.smooth_l1(pyx - po_t_yx), -1)
                + jnp.sum(loss_ops.smooth_l1(phw - po_t_hw), -1))

    num_pos = g.count.astype(jnp.float32) + jnp.sum(pos_f)
    denom = jnp.maximum(num_pos, 1e-8)
    conf_loss = (jnp.sum(best_focal * vmask) + jnp.sum(po_focal * pos_f)
                 + jnp.sum(bg_focal * neg_f)) / denom
    coord_loss = (jnp.sum(best_coord * vmask) + jnp.sum(po_coord * pos_f)) / denom
    return conf_loss + coord_loss


def retina_loss(pconf, pyx, phw, anc: AnchorSet, gt, num_classes_total: int,
                alpha: float, gamma: float, sample_weight=None):
    gt_y1x1, gt_y2x2 = box_ops.center_to_corners(gt[..., 0:2], gt[..., 2:4])
    gt_valid = jax.vmap(
        lambda t: jnp.arange(t.shape[0], dtype=jnp.int32)
        < matching.valid_gt_count(t))(gt)
    assign = matching.assign_batch(gt_y1x1, gt_y2x2, gt_valid,
                                   anc.y1x1, anc.y2x2)
    per_image = jax.vmap(
        lambda y, h, c, g, asg: _image_loss(y, h, c, anc, g, asg,
                                            num_classes_total, alpha, gamma)
    )(pyx, phw, pconf, gt, assign)
    return loss_ops.weighted_mean(per_image, sample_weight)
