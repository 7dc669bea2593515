"""Light-Head R-CNN: RPN + thin-feature RoI head (reference: LH_RCNN.py).

Fixed-shape TPU rendering of the reference's two-stage pipeline:
  * border-crossing anchors are removed STATICALLY at build time (the anchor grid is
    a compile-time constant; the reference's runtime boolean_mask LH_RCNN.py:87-96
    becomes a NumPy filter — note the reference keeps anchors with
    ``y2x2 <= (H-1)-1``, i.e. H-2);
  * RPN matching: best-per-gt + IoU > 0.5 positives / < 0.3 negatives (IoU denominator
    carries the reference's 1e-8 epsilon, LH_RCNN.py:329); sampling is NMS(0.7) on
    objectness prob for <= 128 positives and NMS-on-loss for <= 256-pos negatives,
    expressed with fixed 128/256-slot buffers + validity masks;
  * RoI sampling feeds the RCNN with proposals decoded from the sampled anchors;
    the RCNN yx regression target divides by the proposal CENTER (quirk Q12,
    LH_RCNN.py:430);
  * the alternating rpn/rcnn phase schedule is a ``where``-masked parameter update
    inside one jitted step (see models/lhrcnn.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import Conv, ConvBN, max_pool_same
from tpudet.ops import anchors as anchor_ops
from tpudet.ops import boxes as box_ops
from tpudet.ops import losses as loss_ops
from tpudet.ops import matching, nms, roi
from tpudet.heads.ssd import AnchorSet

ANCHOR_SCALES = (32.0, 64.0, 128.0, 256.0, 512.0)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
POS_CAP = 128
TOTAL_CAP = 256


def build_anchors(fh: int, fw: int, stride: float, img_h: int, img_w: int):
    """15 anchors/cell (scale-major, ratio-minor, LH_RCNN.py:286-291), then the
    static border filter. Returns (AnchorSet of the KEPT anchors, keep_mask)."""
    priors = []
    for size in ANCHOR_SCALES:
        for r in ANCHOR_RATIOS:
            priors.append([size * (r ** 0.5), size / (r ** 0.5)])
    y1x1, y2x2, yx, hw = anchor_ops.grid_anchors(fh, fw, priors, stride, stride)
    h_lim, w_lim = float(img_h - 1), float(img_w - 1)
    keep = ((y1x1[:, 0] >= 0) & (y1x1[:, 1] >= 0)
            & (y2x2[:, 0] <= h_lim - 1) & (y2x2[:, 1] <= w_lim - 1))
    return AnchorSet(jnp.asarray(y1x1[keep]), jnp.asarray(y2x2[keep]),
                     jnp.asarray(yx[keep]), jnp.asarray(hw[keep])), keep


class SeparableConvBN(nn.Module):
    """tf.layers.separable_conv2d (depthwise + pointwise, no bias) + BN + act."""

    filters: int
    kernel: tuple  # (kh, kw)
    stride: int = 1
    activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, self.kernel, strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


class XceptionLite(nn.Module):
    """Separable-conv stride-32 backbone (LH_RCNN.py:242-267)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBN(24, 3, stride=2, activation=nn.relu, dtype=self.dtype,
                   name="stage1_conv1")(x, train)
        x = max_pool_same(x, 3, 2)
        x = ConvBN(144, 3, stride=2, activation=nn.relu, dtype=self.dtype,
                   name="stage2_conv1")(x, train)
        for i in range(3):
            x = SeparableConvBN(144, (3, 3), dtype=self.dtype,
                                name=f"stage2_sconv{i + 2}")(x, train)
        x = ConvBN(288, 3, stride=2, activation=nn.relu, dtype=self.dtype,
                   name="stage3_conv1")(x, train)
        for i in range(7):
            x = SeparableConvBN(288, (3, 3), dtype=self.dtype,
                                name=f"stage3_sconv{i + 2}")(x, train)
        x = ConvBN(576, 3, stride=2, activation=nn.relu, dtype=self.dtype,
                   name="stage4_conv1")(x, train)
        for i in range(3):
            x = SeparableConvBN(576, (3, 3), dtype=self.dtype,
                                name=f"stage4_sconv{i + 2}")(x, train)
        return x  # stride 32


class LHRCNNTrunk(nn.Module):
    """Backbone + RPN heads + thin rcnn feature map. RoI head applied separately."""

    num_anchors: int = len(ANCHOR_SCALES) * len(ANCHOR_RATIOS)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        c4 = XceptionLite(dtype=self.dtype, name="feature_extractor")(x, train)
        r = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                   name="rpn_conv")(c4, train)
        rpn_conf = ConvBN(self.num_anchors * 2, 3, dtype=self.dtype,
                          name="rpn_conf")(r, train)
        rpn_loc = ConvBN(self.num_anchors * 4, 3, dtype=self.dtype,
                         name="rpn_pbbox")(r, train)
        b1 = SeparableConvBN(256, (1, 15), dtype=self.dtype,
                             name="state5_conv1_1")(c4, train)
        b1 = SeparableConvBN(490, (15, 1), dtype=self.dtype,
                             name="state5_conv1_2")(b1, train)
        b2 = SeparableConvBN(256, (1, 15), dtype=self.dtype,
                             name="state5_conv2_1")(c4, train)
        b2 = SeparableConvBN(490, (15, 1), dtype=self.dtype,
                             name="state5_conv2_2")(b2, train)
        rcnn_feat = b1 + b2
        return rpn_conf, rpn_loc, rcnn_feat


class RoIHead(nn.Module):
    """flatten -> dense 2048 relu -> (C+1) cls + 4 box (LH_RCNN.py:169-171).
    Plain dense layers (bias, no BN)."""

    num_classes_total: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        x = roi_feat.reshape(roi_feat.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(2048, dtype=self.dtype, name="roi_feat_dense")(x))
        pconf = nn.Dense(self.num_classes_total, dtype=self.dtype, name="rcnn_pconf")(x)
        pbbox = nn.Dense(4, dtype=self.dtype, name="rcnn_pbbox")(x)
        return pconf.astype(jnp.float32), pbbox.astype(jnp.float32)


class RPNSample(NamedTuple):
    """Fixed-slot per-image RPN result feeding the RCNN stage."""

    rpn_loss: jnp.ndarray        # scalar
    pos_proposal: jnp.ndarray    # [POS_CAP, 4] corners (pixels, unclipped)
    pos_label: jnp.ndarray       # [POS_CAP] int32
    pos_truth: jnp.ndarray       # [POS_CAP, 4] rcnn box targets (quirk Q12)
    pos_valid: jnp.ndarray       # [POS_CAP] bool
    neg_proposal: jnp.ndarray    # [TOTAL_CAP, 4]
    neg_valid: jnp.ndarray       # [TOTAL_CAP] bool


class _RPNPre(NamedTuple):
    """Per-image NMS inputs for the RPN sampling stage (phase 1 of the split)."""

    row_boxes: jnp.ndarray     # [G+A, 4]
    row_obj_prob: jnp.ndarray  # [G+A]
    row_valid: jnp.ndarray     # [G+A] bool
    row_anchor: jnp.ndarray    # [G+A] int32
    row_gt: jnp.ndarray        # [G+A] int32
    row_ce: jnp.ndarray        # [G+A]
    chosen_pos: jnp.ndarray    # scalar int32
    neg_ce: jnp.ndarray        # [A]
    neg: jnp.ndarray           # [A] bool
    chosen_neg: jnp.ndarray    # scalar int32


def _rpn_pre_nms(pyx, phw, pconf, anc: AnchorSet, gt) -> _RPNPre:
    """LH_RCNN.py:299-405 up to (but excluding) the two sampling NMS calls."""
    g = matching.unpack_gt(gt)
    a = anc.y1x1.shape[0]
    gcount = g.count
    iou = box_ops.pairwise_iou(g.y1x1, g.y2x2, anc.y1x1, anc.y2x2, eps=1e-8)
    iou = jnp.where(g.valid[:, None], iou, 0.0)

    best_anchor = matching.best_anchor_per_gt(iou)
    best_set = matching.scatter_best_mask(best_anchor, g.valid, a)
    other = jnp.logical_not(best_set)
    max_agiou, rg = matching.best_gt_per_anchor(iou, g.valid)
    pos_other = jnp.logical_and(other, max_agiou > 0.5)
    neg = jnp.logical_and(other, max_agiou < 0.3)

    # ---- positive rows: best(gt rows) + pos anchors, in fixed [G + A] row space ----
    # row r < G: gt row r matched to best_anchor[r]; row >= G: anchor (r - G)
    G = g.yx.shape[0]
    row_anchor = jnp.concatenate([best_anchor, jnp.arange(a, dtype=jnp.int32)])
    row_gt = jnp.concatenate([jnp.arange(G, dtype=jnp.int32), rg])
    row_valid = jnp.concatenate([g.valid, pos_other])
    row_boxes = jnp.concatenate([anc.y1x1[row_anchor], anc.y2x2[row_anchor]], -1)
    row_obj_prob = jax.nn.softmax(pconf, -1)[:, 0][row_anchor]
    row_ce = loss_ops.softmax_cross_entropy(pconf[row_anchor],
                                            jnp.zeros((G + a,), jnp.int32))

    num_pos = gcount + jnp.sum(pos_other.astype(jnp.int32))
    chosen_pos = jnp.minimum(num_pos, POS_CAP)

    neg_ce = loss_ops.softmax_cross_entropy(pconf, jnp.ones((a,), jnp.int32))
    num_neg = jnp.sum(neg.astype(jnp.int32))
    chosen_neg = jnp.minimum(num_neg, TOTAL_CAP - chosen_pos)
    return _RPNPre(row_boxes, row_obj_prob, row_valid, row_anchor, row_gt, row_ce,
                   chosen_pos, neg_ce, neg, chosen_neg)


def _rpn_post_nms(pre: _RPNPre, pos_sel, pos_sel_valid, neg_sel, neg_sel_valid,
                  pyx, phw, anc: AnchorSet, gt) -> RPNSample:
    """LH_RCNN.py:405-442 from the NMS selections onward."""
    g = matching.unpack_gt(gt)
    pos_f = pos_sel_valid.astype(jnp.float32)
    pos_conf_loss = (jnp.sum(pre.row_ce[pos_sel] * pos_f)
                     / jnp.maximum(jnp.sum(pos_f), 1.0))
    neg_f = neg_sel_valid.astype(jnp.float32)
    neg_loss = (jnp.sum(pre.neg_ce[neg_sel] * neg_f)
                / jnp.maximum(jnp.sum(neg_f), 1.0))

    # ---- coord loss over the selected positives ----
    sel_anchor = pre.row_anchor[pos_sel]
    sel_gt = pre.row_gt[pos_sel]
    a_yx = anc.yx[sel_anchor]
    a_hw = anc.hw[sel_anchor]
    g_yx = g.yx[sel_gt]
    g_hw = jnp.maximum(g.hw[sel_gt], 1e-8)
    t_yx = (g_yx - a_yx) / a_hw
    t_hw = jnp.log(g_hw / a_hw)
    p_yx = pyx[sel_anchor]
    p_hw = phw[sel_anchor]
    coord = (jnp.sum(loss_ops.smooth_l1(p_yx - t_yx), -1)
             + jnp.sum(loss_ops.smooth_l1(p_hw - t_hw), -1))
    coord_loss = jnp.sum(coord * pos_f) / jnp.maximum(jnp.sum(pos_f), 1.0)

    rpn_loss = neg_loss + pos_conf_loss + 10.0 * coord_loss

    # ---- proposals for the RCNN stage ----
    prop_yx = a_hw * p_yx + a_yx
    prop_hw = jnp.exp(p_hw) * a_hw
    # quirk Q12: the yx target divides by the proposal CENTER, not its size
    truth_yx = (g_yx - prop_yx) / prop_yx
    truth_hw = jnp.log(g_hw / jnp.maximum(prop_hw, 1e-12))
    pos_truth = jnp.concatenate([truth_yx, truth_hw], -1)
    pos_proposal = jnp.concatenate([prop_yx - prop_hw / 2.0,
                                    prop_yx + prop_hw / 2.0], -1)
    pos_label = g.label[sel_gt]

    n_anchor = neg_sel
    n_yx = anc.hw[n_anchor] * pyx[n_anchor] + anc.yx[n_anchor]
    n_hw = jnp.exp(phw[n_anchor]) * anc.hw[n_anchor]
    neg_proposal = jnp.concatenate([n_yx - n_hw / 2.0, n_yx + n_hw / 2.0], -1)

    return RPNSample(rpn_loss, pos_proposal, pos_label, pos_truth, pos_sel_valid,
                     neg_proposal, neg_sel_valid)


def rpn_loss_and_sample(pyx, phw, pconf, anc: AnchorSet, gt) -> RPNSample:
    """Batched RPN loss + proposal sampling (LH_RCNN.py:299-442), all inputs with a
    leading batch dim. The two sampling NMS passes (positives NMS-on-objectness,
    negatives NMS-on-loss, LH_RCNN.py:387-405) run on the batched NMS path — one
    Pallas kernel launch each on TPU instead of a per-image fori_loop inside vmap."""
    pre = jax.vmap(lambda y, h, c, g: _rpn_pre_nms(y, h, c, anc, g))(
        pyx, phw, pconf, gt)
    pos_sel, pos_sel_valid = nms.batched_greedy_nms(
        pre.row_boxes, pre.row_obj_prob, pre.chosen_pos, POS_CAP, 0.7,
        active=pre.row_valid)
    anc_corners = jnp.concatenate([anc.y1x1, anc.y2x2], -1)
    neg_sel, neg_sel_valid = nms.batched_greedy_nms(
        anc_corners, pre.neg_ce, pre.chosen_neg, TOTAL_CAP, 0.7, active=pre.neg)
    return jax.vmap(
        lambda p, ps, pv, ns, nv, y, h, g: _rpn_post_nms(p, ps, pv, ns, nv, y, h,
                                                         anc, g)
    )(pre, pos_sel, pos_sel_valid, neg_sel, neg_sel_valid, pyx, phw, gt)


def rpn_image_loss_and_sample(pyx, phw, pconf, anc: AnchorSet, gt) -> RPNSample:
    """Single-image convenience wrapper (tests/oracle comparisons)."""
    batched = rpn_loss_and_sample(pyx[None], phw[None], pconf[None], anc, gt[None])
    return jax.tree.map(lambda x: x[0], batched)


def rcnn_losses(roi_head_fn, rcnn_feat, sample: RPNSample, img_h: float, img_w: float,
                num_classes_total: int, sample_weight=None):
    """Batched RCNN stage: crop_and_resize each image's sampled proposals, run the RoI
    head, CE over pos+neg rows + smooth-L1 over pos rows (LH_RCNN.py:140-177).

    rcnn_feat [B, h, w, C]; sample fields carry a leading batch dim.
    """
    b = rcnn_feat.shape[0]
    # clip bound and crop normalizer are [h, w] — NOT [h-1, w-1] — to match the
    # reference exactly (LH_RCNN.py:146-151: maximum/minimum with [h, w] and
    # norm_factor = [h, w, h, w])
    norm = jnp.asarray([img_h, img_w, img_h, img_w], jnp.float32)
    lo = jnp.zeros((4,), jnp.float32)

    def crop(feat, boxes):
        boxes = jnp.clip(boxes, lo, norm)
        return roi.crop_and_resize(feat, boxes / norm, 7)

    pos_feat = jax.vmap(crop)(rcnn_feat, sample.pos_proposal)  # [B, P, 7,7,C]
    neg_feat = jax.vmap(crop)(rcnn_feat, sample.neg_proposal)  # [B, N, 7,7,C]
    feats = jnp.concatenate([pos_feat.reshape(-1, 7, 7, pos_feat.shape[-1]),
                             neg_feat.reshape(-1, 7, 7, neg_feat.shape[-1])], 0)
    pconf, pbbox = roi_head_fn(feats)
    n_pos_rows = b * POS_CAP

    pos_labels = sample.pos_label.reshape(-1)
    neg_labels = jnp.full((b * TOTAL_CAP,), num_classes_total - 1, jnp.int32)
    labels = jnp.concatenate([pos_labels, neg_labels])
    valid = jnp.concatenate([sample.pos_valid.reshape(-1),
                             sample.neg_valid.reshape(-1)]).astype(jnp.float32)
    if sample_weight is not None:
        # zero out proposal rows that belong to mesh-padding images
        w = sample_weight.astype(jnp.float32)
        row_w = jnp.concatenate([jnp.repeat(w, POS_CAP), jnp.repeat(w, TOTAL_CAP)])
        valid = valid * row_w
    ce = loss_ops.softmax_cross_entropy(pconf, labels)
    conf_loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    pos_pbbox = pbbox[:n_pos_rows]
    truth = sample.pos_truth.reshape(-1, 4)
    pv = sample.pos_valid.reshape(-1).astype(jnp.float32)
    if sample_weight is not None:
        pv = pv * jnp.repeat(sample_weight.astype(jnp.float32), POS_CAP)
    box_l = jnp.sum(loss_ops.smooth_l1(pos_pbbox - truth), -1)
    box_loss = jnp.sum(box_l * pv) / jnp.maximum(jnp.sum(pv), 1.0)
    return conf_loss + box_loss


def lhrcnn_decode(roi_head_fn, rcnn_feat, pyx, phw, pconf, anc: AnchorSet,
                  img_h: float, img_w: float, num_classes_total: int,
                  post_nms_proposal: int, score_threshold: float,
                  iou_threshold: float, max_boxes: int, pre_topk: int = 100):
    """Single-image inference (LH_RCNN.py:134-171, 205-240)."""
    prop_yx = pyx * anc.hw + anc.yx
    prop_hw = jnp.exp(phw) * anc.hw
    proposal = jnp.concatenate([prop_yx - prop_hw / 2.0, prop_yx + prop_hw / 2.0], -1)
    # reference clips and normalizes by [h, w], not [h-1, w-1] (LH_RCNN.py:158-168)
    norm = jnp.asarray([img_h, img_w, img_h, img_w], jnp.float32)
    proposal = jnp.clip(proposal, jnp.zeros((4,)), norm)
    obj = jax.nn.softmax(pconf, -1)[:, 0]
    # batched path (batch of 1): on TPU the 500-trip greedy loop runs inside
    # the VMEM-resident Pallas kernel instead of a 500-iteration XLA fori_loop
    # over the full ~23k-anchor row (a dominant share of the 258 ms round-4
    # inference p50)
    sel_b, sel_valid_b = nms.batched_greedy_nms(
        proposal[None], obj[None],
        jnp.full((1,), post_nms_proposal, jnp.int32), post_nms_proposal, 0.7)
    sel, sel_valid = sel_b[0], sel_valid_b[0]
    proposal = proposal[sel]
    prop_yx2 = (proposal[:, 0:2] + proposal[:, 2:4]) / 2.0
    prop_hw2 = proposal[:, 2:4] - proposal[:, 0:2]

    feats = roi.crop_and_resize(rcnn_feat, proposal / norm, 7)
    rconf, rbbox = roi_head_fn(feats)
    conf = jax.nn.softmax(rconf, -1)
    not_bg = jnp.argmax(conf, -1) < num_classes_total - 1
    keep = jnp.logical_and(sel_valid, not_bg)
    d_yx = rbbox[:, 0:2] * prop_hw2 + prop_yx2
    d_hw = prop_hw2 * jnp.exp(rbbox[:, 2:4])
    boxes = jnp.concatenate([d_yx - d_hw / 2.0, d_yx + d_hw / 2.0], -1)
    class_scores = conf[:, : num_classes_total - 1].T
    sel_boxes, sel_scores, sel_v, trunc = nms.per_class_nms(
        boxes, class_scores, score_threshold, min(pre_topk, post_nms_proposal),
        max_boxes, iou_threshold, class_active=keep)
    c = num_classes_total - 1
    cid = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None], (c, max_boxes))
    return (sel_scores.reshape(-1), sel_boxes.reshape(-1, 4), cid.reshape(-1),
            sel_v.reshape(-1), trunc)
