"""RefineDet / PFPNet-R cascade heads: ARM -> TCB -> ODM (references: RefineDet.py,
PFPNetR.py — PFPNet reuses RefineDet's ARM/TCB/ODM wholesale, a deviation from the
PFPNet paper inherited from the reference).

Matching (RefineDet.py:420-561): one SSD-style matcher on the RAW anchors drives both
stages — best-anchor-per-gt rows + other anchors with IoU > 0.5 positive, < 0.4
negative (ignore band between):
  * ARM: binary (object=0 / background=1) CE, hard negatives by NMS-on-loss
    (iou 0.7, <= 3x positives), box targets vs the anchors;
  * ODM: negatives are the ARM-selected negatives further filtered by ARM background
    LOGIT < 0.99 (the reference compares the raw logit, not a probability —
    RefineDet.py:535); class CE over C+1; box targets vs the ARM-REFINED boxes.

Inference (RefineDet.py:185-226): cascade decode anchors -> ARM -> ODM, dropping
anchors with ARM background PROBABILITY >= 0.99 (softmax here) or ODM argmax ==
background, then per-class NMS.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.backbones.vgg import VGG16Trunk
from tpudet.nn.layers import ConvBN, L2NormScale, max_pool_same
from tpudet.ops import anchors as anchor_ops
from tpudet.ops import boxes as box_ops
from tpudet.ops import losses as loss_ops
from tpudet.ops import matching, nms
from tpudet.heads import ssd as ssd_head
from tpudet.heads.ssd import AnchorSet

ANCHOR_RATIOS = (0.5, 1.0, 2.0)
STRIDES = (8, 16, 32, 64)


def build_anchors(feat_shapes: Sequence[Sequence[int]],
                  strides: Sequence[int] = STRIDES) -> AnchorSet:
    """3 anchors/cell, size = 4*stride, ratios {1/2, 1, 2} (RefineDet.py:398-418)."""
    levels = []
    for (fh, fw), stride in zip(feat_shapes, strides):
        size = 4.0 * stride
        priors = [[size * (r ** 0.5), size / (r ** 0.5)] for r in ANCHOR_RATIOS]
        levels.append(anchor_ops.grid_anchors(fh, fw, priors, stride, stride))
    arrs = anchor_ops.concat_levels(levels)
    return AnchorSet(*(jnp.asarray(a) for a in arrs))


class _DeconvBN(nn.Module):
    """conv_transpose + BN, optional activation (RefineDet.py _dconv_layer)."""

    filters: int
    kernel: int = 4
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.filters, (self.kernel, self.kernel),
                             strides=(self.stride, self.stride), padding="SAME",
                             dtype=self.dtype, name="dconv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype, name="bn")(x)


class ARM(nn.Module):
    """Anchor refinement module: 4 ConvBN-ReLU + loc(4K)/conf(2K) ConvBN heads."""

    num_anchors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for j in range(4):
            x = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                       name=f"conv{j + 1}")(x, train)
        ploc = ConvBN(4 * self.num_anchors, 3, dtype=self.dtype, name="loc")(x, train)
        pconf = ConvBN(2 * self.num_anchors, 3, dtype=self.dtype, name="conf")(x, train)
        return ploc, pconf


class TCB(nn.Module):
    """Transfer connection block with deconv top-down fusion (RefineDet.py:364-372)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, high, train: bool):
        x = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN(256, 3, dtype=self.dtype, name="conv2")(x, train)
        if high is not None:
            x = nn.relu(x + _DeconvBN(256, dtype=self.dtype, name="up")(high, train))
        return nn.relu(x)


class ODM(nn.Module):
    """Object detection module: 4 ConvBN-ReLU + loc(4K)/conf((C+1)K) heads."""

    num_classes_total: int
    num_anchors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for j in range(4):
            x = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                       name=f"conv{j + 1}")(x, train)
        ploc = ConvBN(4 * self.num_anchors, 3, dtype=self.dtype, name="loc")(x, train)
        pconf = ConvBN(self.num_classes_total * self.num_anchors, 3, dtype=self.dtype,
                       name="conf")(x, train)
        return ploc, pconf


class RefineDetExtractor(nn.Module):
    """VGG-16 + dilated conv6/7 + conv8/9/10 extras; endpoints at strides 8/16/32/64
    with learned L2-norm scales 10/8 on conv4_3/conv5_3 (RefineDet.py:74-91,
    228-352). The channels_first reshape bug (Q11) is moot in always-NHWC tpudet."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv4_3, conv5_3 = VGG16Trunk(dtype=self.dtype, name="vgg")(x)
        p = max_pool_same(conv5_3, 3, 1)
        p = ConvBN(1024, 3, dilation=2, activation=nn.relu, dtype=self.dtype,
                   name="conv6")(p, train)
        p = ConvBN(1024, 1, activation=nn.relu, dtype=self.dtype, name="conv7")(p, train)
        p = ConvBN(256, 1, activation=nn.relu, dtype=self.dtype, name="conv8_1")(p, train)
        conv8_2 = ConvBN(512, 3, stride=2, activation=nn.relu, dtype=self.dtype,
                         name="conv8_2")(p, train)
        p = ConvBN(256, 1, activation=nn.relu, dtype=self.dtype,
                   name="conv9_1")(conv8_2, train)
        conv9_2 = ConvBN(512, 3, stride=2, activation=nn.relu, dtype=self.dtype,
                         name="conv9_2")(p, train)
        p = ConvBN(256, 1, activation=nn.relu, dtype=self.dtype,
                   name="conv10_1")(conv9_2, train)
        conv10_2 = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                          name="conv10_2")(p, train)
        feat1 = L2NormScale(init=10.0, name="feat1_l2_norm")(conv4_3)
        feat2 = L2NormScale(init=8.0, name="feat2_l2_norm")(conv5_3)
        return feat1, feat2, conv8_2, conv10_2


def _resize_bilinear_align(x, out_h: int, out_w: int):
    """tf.image.resize_bilinear(align_corners=True) for the MSCA downscales."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    ys = jnp.arange(out_h, dtype=jnp.float32) * ((h - 1) / max(out_h - 1, 1))
    xs = jnp.arange(out_w, dtype=jnp.float32) * ((w - 1) / max(out_w - 1, 1))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class PFPNetExtractor(nn.Module):
    """VGG through conv4_3 + MSCA parallel pyramid (PFPNetR.py:230-401): bilinear
    downscales of conv4_3, 1x1 bottlenecks to 512//6 ch, deconv-up and avgpool-down
    cross-scale chains, 4-source concat per level, L2-norm scales on feat1/feat2."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv4_3, _ = VGG16Trunk(dtype=self.dtype, name="vgg")(x)
        fh1 = conv4_3
        h, w = fh1.shape[1], fh1.shape[2]
        fh2 = _resize_bilinear_align(fh1, h // 2, w // 2)
        fh3 = _resize_bilinear_align(fh1, h // 4, w // 4)
        fh4 = _resize_bilinear_align(fh1, h // 8, w // 8)
        ch = 512 // 6

        def conv1x1(t, name, act=True):
            return ConvBN(ch, 1, activation=nn.relu if act else None,
                          dtype=self.dtype, name=name)(t, train)

        fl1 = conv1x1(fh1, "fl1")
        fl2 = conv1x1(fh2, "fl2")
        fl3 = conv1x1(fh3, "fl3")
        fl4 = conv1x1(fh4, "fl4")
        # deconv-up chains
        fl2_1 = conv1x1(_DeconvBN(ch, dtype=self.dtype, name="up2_1")(fl2, train) + fl1,
                        "fl2_1")
        fl3_2 = conv1x1(_DeconvBN(ch, dtype=self.dtype, name="up3_2")(fl3, train) + fl2,
                        "fl3_2")
        fl3_1 = conv1x1(_DeconvBN(ch, dtype=self.dtype, name="up3_1")(fl3_2, train) + fl1,
                        "fl3_1")
        fl4_3 = conv1x1(_DeconvBN(ch, dtype=self.dtype, name="up4_3")(fl4, train) + fl3,
                        "fl4_3")
        fl4_2 = conv1x1(_DeconvBN(ch, dtype=self.dtype, name="up4_2")(fl4_3, train) + fl2,
                        "fl4_2")
        fl4_1 = conv1x1(_DeconvBN(ch, dtype=self.dtype, name="up4_1")(fl4_2, train) + fl1,
                        "fl4_1")
        # avgpool-down chains (1x1 convs WITHOUT activation, PFPNetR.py:349-362)
        from tpudet.nn.layers import avg_pool_same

        fl1_2 = conv1x1(avg_pool_same(fl1, 2, 2), "fl1_2", act=False)
        fl1_3 = conv1x1(avg_pool_same(fl1_2, 2, 2), "fl1_3", act=False)
        fl1_4 = conv1x1(avg_pool_same(fl1_3, 2, 2), "fl1_4", act=False)
        fl2_3 = conv1x1(avg_pool_same(fl2, 2, 2), "fl2_3", act=False)
        fl2_4 = conv1x1(avg_pool_same(fl2_3, 2, 2), "fl2_4", act=False)
        fl3_4 = conv1x1(avg_pool_same(fl3, 2, 2), "fl3_4", act=False)

        feat1 = jnp.concatenate([fh1, fl2_1, fl3_1, fl4_1], -1)
        feat2 = jnp.concatenate([fl1_2, fh2, fl3_2, fl4_2], -1)
        feat3 = jnp.concatenate([fl1_3, fl2_3, fh3, fl4_3], -1)
        feat4 = jnp.concatenate([fl1_4, fl2_4, fl3_4, fh4], -1)
        feat1 = L2NormScale(init=10.0, name="feat1_l2_norm")(feat1)
        feat2 = L2NormScale(init=8.0, name="feat2_l2_norm")(feat2)
        return feat1, feat2, feat3, feat4


class RefineNet(nn.Module):
    """Extractor + ARM/TCB/ODM over 4 levels; ``extractor`` picks RefineDet or PFPNet."""

    num_classes_total: int
    extractor: str = "refinedet"  # 'refinedet' | 'pfpnet'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        ext_cls = RefineDetExtractor if self.extractor == "refinedet" else PFPNetExtractor
        feats = ext_cls(dtype=self.dtype, name="feature_extractor")(x, train)
        arms = [ARM(dtype=self.dtype, name=f"arm{i + 1}")(f, train)
                for i, f in enumerate(feats)]
        tcb4 = TCB(dtype=self.dtype, name="tcb4")(feats[3], None, train)
        tcb3 = TCB(dtype=self.dtype, name="tcb3")(feats[2], tcb4, train)
        tcb2 = TCB(dtype=self.dtype, name="tcb2")(feats[1], tcb3, train)
        tcb1 = TCB(dtype=self.dtype, name="tcb1")(feats[0], tcb2, train)
        odms = [ODM(self.num_classes_total, dtype=self.dtype, name=f"odm{i + 1}")(t, train)
                for i, t in enumerate((tcb1, tcb2, tcb3, tcb4))]
        return arms, odms


def flatten_preds(arms, odms, num_classes_total: int):
    """Per-level (loc, conf) -> concatenated (arm_yx, arm_hw, arm_conf [B,A,2],
    odm_yx, odm_hw, odm_conf [B,A,C+1])."""
    def _cat(preds, channels):
        locs, confs = [], []
        for ploc, pconf in preds:
            b = ploc.shape[0]
            locs.append(ploc.reshape(b, -1, 4))
            confs.append(pconf.reshape(b, -1, channels))
        return (jnp.concatenate(locs, 1).astype(jnp.float32),
                jnp.concatenate(confs, 1).astype(jnp.float32))

    arm_loc, arm_conf = _cat(arms, 2)
    odm_loc, odm_conf = _cat(odms, num_classes_total)
    return (arm_loc[..., :2], arm_loc[..., 2:], arm_conf,
            odm_loc[..., :2], odm_loc[..., 2:], odm_conf)


def _image_terms(arm_yx, arm_hw, arm_conf, odm_yx, odm_hw, odm_conf,
                 anc: AnchorSet, gt, assign, num_classes_total: int):
    """Per-image matching terms on the PRE-COMPUTED assignment (one batched
    Pallas program on TPU — matching.assign_batch), minus the hard-negative NMS
    (which also runs batched outside the vmap). Returns (pos_loss,
    neg_arm_ce [A], neg [A], chosen, arm_bg_logit [A], odm_bg_ce [A])."""
    g = matching.unpack_gt(gt)
    best_anchor, max_agiou, rg, best_set = assign

    vmask = g.valid.astype(jnp.float32)
    other = jnp.logical_not(best_set)
    pos = jnp.logical_and(other, max_agiou > 0.5)
    neg = jnp.logical_and(other, max_agiou < 0.4)
    pos_f = pos.astype(jnp.float32)
    num_pos_int = g.count + jnp.sum(pos.astype(jnp.int32))
    denom = jnp.maximum(num_pos_int.astype(jnp.float32), 1e-8)

    ghw_safe = jnp.maximum(g.hw, 1e-8)

    # ------------------------------------------------------------- ARM stage
    # positive rows: best (per gt) + pos anchors; ARM class target is 0 = object.
    # CE readouts in the lane-friendly [C, A] layout by default (the ARM's
    # C=2 / ODM's C=21 minor axis pads to 128 TPU lanes — see
    # heads/ssd.py:_conf_ce_terms and the BASELINE.md round-4 perf note);
    # TPUDET_SSD_CONF_LAYOUT=ac reverts to the reference-shaped form.
    if os.environ.get("TPUDET_SSD_CONF_LAYOUT", "ca") == "ca":
        arm_ca = arm_conf.T  # [2, A]
        m = jnp.max(arm_ca, axis=0)
        logz = m + jnp.log(jnp.sum(jnp.exp(arm_ca - m[None, :]), axis=0))
        arm_lp0 = arm_ca[0] - logz
        arm_lp1 = arm_ca[1] - logz
        a = arm_conf.shape[0]
        best_oh = (
            best_anchor[:, None] == jnp.arange(a, dtype=best_anchor.dtype)
        ).astype(jnp.float32)  # [G, A]
        best_arm_ce = -jnp.einsum("ga,a->g", best_oh, arm_lp0,
                                  precision=jax.lax.Precision.HIGHEST)
        pos_arm_ce = -arm_lp0
        neg_arm_ce_all = -arm_lp1
    else:
        arm_lp = loss_ops.log_softmax(arm_conf)
        best_arm_ce = -arm_lp[best_anchor, 0]
        pos_arm_ce = -arm_lp[:, 0]
        neg_arm_ce_all = -arm_lp[:, 1]
    arm_conf_loss = (jnp.sum(best_arm_ce * vmask) + jnp.sum(pos_arm_ce * pos_f)) / denom

    bt_yx, bt_hw = box_ops.encode(g.yx, ghw_safe, anc.yx[best_anchor],
                                  anc.hw[best_anchor])
    best_arm_coord = (jnp.sum(loss_ops.smooth_l1(arm_yx[best_anchor] - bt_yx), -1)
                      + jnp.sum(loss_ops.smooth_l1(arm_hw[best_anchor] - bt_hw), -1))
    rg_label, rg_yx, rg_hw = matching.gather_gt_rows(rg, g.label, g.yx, g.hw)
    rg_hw_safe = jnp.maximum(rg_hw, 1e-8)
    pt_yx, pt_hw = box_ops.encode(rg_yx, rg_hw_safe, anc.yx, anc.hw)
    pos_arm_coord = (jnp.sum(loss_ops.smooth_l1(arm_yx - pt_yx), -1)
                     + jnp.sum(loss_ops.smooth_l1(arm_hw - pt_hw), -1))
    arm_coord_loss = (jnp.sum(best_arm_coord * vmask) + jnp.sum(pos_arm_coord * pos_f)) / denom

    # hard-negative candidates: the NMS itself runs batched outside the vmap
    neg_arm_ce = neg_arm_ce_all
    num_neg = jnp.sum(neg.astype(jnp.int32))
    chosen = jnp.minimum(num_neg, 3 * num_pos_int)

    # ------------------------------------------------------------- ODM stage
    # same three readouts as the SSD conf block — shares its layout-optimized
    # helper (heads/ssd.py:_conf_ce_terms; odm_neg_ce = CE at the background
    # class, returned to the caller for the ARM-easy negative filter)
    best_odm_ce, pos_odm_ce, odm_neg_ce = ssd_head._conf_ce_terms(
        odm_conf, best_anchor, g.label, rg_label, num_classes_total)
    odm_conf_loss = (jnp.sum(best_odm_ce * vmask) + jnp.sum(pos_odm_ce * pos_f)) / denom

    # ODM box targets vs ARM-refined boxes
    b_arm_byx, b_arm_bhw = box_ops.decode(arm_yx[best_anchor], arm_hw[best_anchor],
                                          anc.yx[best_anchor], anc.hw[best_anchor])
    bo_yx = (g.yx - b_arm_byx) / b_arm_bhw
    bo_hw = jnp.log(ghw_safe / b_arm_bhw)
    best_odm_coord = (jnp.sum(loss_ops.smooth_l1(odm_yx[best_anchor] - bo_yx), -1)
                      + jnp.sum(loss_ops.smooth_l1(odm_hw[best_anchor] - bo_hw), -1))
    p_arm_byx, p_arm_bhw = box_ops.decode(arm_yx, arm_hw, anc.yx, anc.hw)
    po_yx = (rg_yx - p_arm_byx) / p_arm_bhw
    po_hw = jnp.log(rg_hw_safe / p_arm_bhw)
    pos_odm_coord = (jnp.sum(loss_ops.smooth_l1(odm_yx - po_yx), -1)
                     + jnp.sum(loss_ops.smooth_l1(odm_hw - po_hw), -1))
    odm_coord_loss = (jnp.sum(best_odm_coord * vmask) + jnp.sum(pos_odm_coord * pos_f)) / denom

    pos_loss = arm_conf_loss + arm_coord_loss + odm_conf_loss + odm_coord_loss
    return (pos_loss, neg_arm_ce, neg, chosen, arm_conf[:, 1], odm_neg_ce)


def refine_loss(arm_yx, arm_hw, arm_conf, odm_yx, odm_hw, odm_conf, anc: AnchorSet,
                gt, num_classes_total: int, neg_sel_cap: int = 384,
                sample_weight=None):
    gt_y1x1, gt_y2x2 = box_ops.center_to_corners(gt[..., 0:2], gt[..., 2:4])
    gt_valid = jax.vmap(
        lambda t: jnp.arange(t.shape[0], dtype=jnp.int32)
        < matching.valid_gt_count(t))(gt)
    assign = matching.assign_batch(gt_y1x1, gt_y2x2, gt_valid,
                                   anc.y1x1, anc.y2x2)
    (pos_loss, neg_arm_ce, neg, chosen, arm_bg_logit, odm_bg_ce) = jax.vmap(
        lambda ay, ah, ac, oy, oh, oc, g, asg: _image_terms(
            ay, ah, ac, oy, oh, oc, anc, g, asg, num_classes_total)
    )(arm_yx, arm_hw, arm_conf, odm_yx, odm_hw, odm_conf, gt, assign)
    anc_corners = jnp.concatenate([anc.y1x1, anc.y2x2], -1)
    sel, sel_valid = nms.batched_greedy_nms(
        anc_corners, neg_arm_ce, chosen, neg_sel_cap, 0.7, active=neg)
    sel_f = sel_valid.astype(jnp.float32)
    sel_arm_ce = jnp.take_along_axis(neg_arm_ce, sel, axis=1)
    neg_arm_loss = (jnp.sum(sel_arm_ce * sel_f, -1)
                    / jnp.maximum(jnp.sum(sel_f, -1), 1.0))
    # ODM negatives: ARM-selected negatives whose ARM background LOGIT < 0.99
    odm_keep = jnp.logical_and(
        sel_valid, jnp.take_along_axis(arm_bg_logit, sel, axis=1) < 0.99
    ).astype(jnp.float32)
    sel_odm_ce = jnp.take_along_axis(odm_bg_ce, sel, axis=1)
    neg_odm_loss = (jnp.sum(sel_odm_ce * odm_keep, -1)
                    / jnp.maximum(jnp.sum(odm_keep, -1), 1.0))
    return loss_ops.weighted_mean(pos_loss + neg_arm_loss + neg_odm_loss,
                                  sample_weight)


def refine_decode(arm_yx, arm_hw, arm_conf, odm_yx, odm_hw, odm_conf, anc: AnchorSet,
                  num_classes_total: int, score_threshold: float, iou_threshold: float,
                  max_boxes: int, pre_topk: int = 200):
    """Single-image cascade decode (RefineDet.py:185-226)."""
    if os.environ.get("TPUDET_SSD_CONF_LAYOUT", "ca") == "ca":
        # [C, A] scoring, as in ssd_decode (per_class_nms wants [C, A] anyway)
        armp_ca = jax.nn.softmax(arm_conf.T, axis=0)
        odmp_ca = jax.nn.softmax(odm_conf.T, axis=0)
        keep = jnp.logical_and(armp_ca[1] < 0.99,
                               jnp.argmax(odmp_ca, 0) < num_classes_total - 1)
        class_scores = odmp_ca[: num_classes_total - 1]
    else:
        armp = jax.nn.softmax(arm_conf, -1)
        odmp = jax.nn.softmax(odm_conf, -1)
        keep = jnp.logical_and(armp[:, 1] < 0.99,
                               jnp.argmax(odmp, -1) < num_classes_total - 1)
        class_scores = odmp[:, : num_classes_total - 1].T
    a_yx, a_hw = box_ops.decode(arm_yx, arm_hw, anc.yx, anc.hw)
    o_yx, o_hw = box_ops.decode(odm_yx, odm_hw, a_yx, a_hw)
    y1x1, y2x2 = box_ops.center_to_corners(o_yx, o_hw)
    boxes = jnp.concatenate([y1x1, y2x2], -1)
    sel_boxes, sel_scores, sel_valid, trunc = nms.per_class_nms(
        boxes, class_scores, score_threshold, pre_topk, max_boxes, iou_threshold,
        class_active=keep)
    c = num_classes_total - 1
    cid = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None], (c, max_boxes))
    return (sel_scores.reshape(-1), sel_boxes.reshape(-1, 4), cid.reshape(-1),
            sel_valid.reshape(-1), trunc)
