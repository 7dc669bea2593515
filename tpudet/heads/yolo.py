"""YOLOv2 / YOLOv3 heads: grid-cell direct regression (references: YOLOv2.py, YOLOv3.py).

Both losses operate in grid units (gt divided by the stride) with the responsible
prior chosen by IoU between the gt box and the priors anchored at the gt's cell.
Reference quirks reproduced exactly (SURVEY.md §6.1):

  * Q3 — decode is ADDITIVE in hw: ``hw = prior + e^p`` (YOLOv2.py:190, YOLOv3.py:341);
  * Q4 — YOLOv3 priors are divided by stride [8,16,32] but attached to the heads of
    stride [32,16,8] (inverted), and inference scales head2 by 32 and head3 by 16;
  * Q5 — every YOLOv3 conv including the prediction convs gets BN+LeakyReLU;
  * Q13 — YOLOv2's ``rescore_confidence`` is accepted but unused (obj target is 1);
  * Q14 — YOLOv2's passthrough concat comes from the stride-32 lrelu17;
  * the responsible-prior and no-object IoUs are computed WITHOUT clamping the
    intersection at zero (YOLOv2.py:122, YOLOv3.py:165-167), and the no-object
    "anchor boxes" are built from swapped corner tensors (YOLOv2.py:148-151) — both
    numerical quirks are kept for loss parity.

Per-image assignment is masked dense over the padded gt and ``vmap``ped over batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.backbones.darknet import DarkNet19, DarkNet53, _DarkConv, _leaky
from tpudet.nn.layers import Conv, ConvBN
from tpudet.ops import losses as loss_ops
from tpudet.ops import matching, nms


# --------------------------------------------------------------------- helpers
def grid_prior_arrays(fh: int, fw: int, priors_hw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(centers [fh,fw,K,2] = cell+0.5, prior hw [fh,fw,K,2]) in grid units
    (YOLOv2.py:230-244)."""
    k = len(priors_hw)
    cy = jnp.arange(fh, dtype=jnp.float32) + 0.5
    cx = jnp.arange(fw, dtype=jnp.float32) + 0.5
    centers = jnp.stack(jnp.meshgrid(cy, cx, indexing="ij"), -1)[:, :, None, :]
    centers = jnp.broadcast_to(centers, (fh, fw, k, 2))
    hw = jnp.broadcast_to(jnp.asarray(priors_hw, jnp.float32)[None, None], (fh, fw, k, 2))
    return centers, hw


def _unclamped_iou(g_y1x1, g_y2x2, a_y1x1, a_y2x2, a_area):
    """IoU with the reference's unclamped intersection (negative extents multiply)."""
    inter = jnp.prod(jnp.minimum(g_y2x2, a_y2x2) - jnp.maximum(g_y1x1, a_y1x1), -1)
    garea = jnp.prod(g_y2x2 - g_y1x1, -1)
    return inter / (a_area + garea - inter)


def split_pred(pred, num_priors: int, num_classes: int):
    """[B,H,W,K*(C+5)] -> (pclass [B,H,W,K,C], pyx, phw, pobj [B,H,W,K,1])."""
    b, h, w, _ = pred.shape
    pred = pred.reshape(b, h, w, num_priors, num_classes + 5).astype(jnp.float32)
    return (pred[..., :num_classes], pred[..., num_classes:num_classes + 2],
            pred[..., num_classes + 2:num_classes + 4], pred[..., num_classes + 4:])


def _responsible_terms(pclass, pyx, phw, pobj, centers, prior_hw, gn_yx, gn_hw,
                       labels, valid, num_classes):
    """Per-gt responsible-prior loss terms at the gt's cell (YOLOv2.py:107-145)."""
    fh, fw, k, _ = prior_hw.shape
    cell = jnp.floor(gn_yx).astype(jnp.int32)
    cy = jnp.clip(cell[:, 0], 0, fh - 1)
    cx = jnp.clip(cell[:, 1], 0, fw - 1)
    r_pyx = pyx[cy, cx]          # [G,K,2]
    r_phw = phw[cy, cx]
    r_pclass = pclass[cy, cx]
    r_pobj = pobj[cy, cx]
    r_ahw = prior_hw[cy, cx]     # [G,K,2]
    r_ac = centers[cy, cx]
    a_y1x1 = r_ac - r_ahw / 2.0
    a_y2x2 = r_ac + r_ahw / 2.0
    g_y1x1 = (gn_yx - gn_hw / 2.0)[:, None, :]
    g_y2x2 = (gn_yx + gn_hw / 2.0)[:, None, :]
    iou = _unclamped_iou(g_y1x1, g_y2x2, a_y1x1, a_y2x2, jnp.prod(r_ahw, -1))  # [G,K]
    kbest = jnp.argmax(iou, -1)
    iou_max = jnp.max(iou, -1)
    gi = jnp.arange(gn_yx.shape[0])
    sel_pyx = r_pyx[gi, kbest]
    sel_phw = r_phw[gi, kbest]
    sel_pclass = r_pclass[gi, kbest]
    sel_pobj = r_pobj[gi, kbest][:, 0]
    sel_ahw = r_ahw[gi, kbest]

    yx_t = gn_yx - jnp.floor(gn_yx)
    hw_t = jnp.log(jnp.maximum(gn_hw, 1e-8) / sel_ahw)
    vf = valid.astype(jnp.float32)
    yx_loss = jnp.sum(loss_ops.sigmoid_cross_entropy(sel_pyx, yx_t), -1) * vf
    hw_loss = 0.5 * jnp.sum(jnp.square(sel_phw - hw_t), -1) * vf
    onehot = jax.nn.one_hot(labels, num_classes)
    class_loss = jnp.sum(loss_ops.sigmoid_cross_entropy(sel_pclass, onehot), -1) * vf
    obj_loss = loss_ops.sigmoid_cross_entropy(sel_pobj, jnp.ones_like(sel_pobj)) * vf
    return (jnp.sum(yx_loss), jnp.sum(hw_loss), jnp.sum(class_loss),
            jnp.sum(obj_loss), iou_max, cy, cx)


def _noobj_term(pobj, centers, prior_hw, gn_yx, gn_hw, valid, cy, cx, iou_thresh,
                swapped_corners=True):
    """No-object loss over cells without gt, with the reference's swapped-corner
    pseudo boxes (YOLOv2.py:146-171). ``swapped_corners=False`` (the opt-in
    ``consistent_geometry`` extension) uses the real anchor boxes instead, so
    high-IoU exemption from noobj suppression applies only where it should."""
    fh, fw, k, _ = prior_hw.shape
    has = jnp.zeros((fh, fw), jnp.int32).at[cy, cx].add(valid.astype(jnp.int32))
    nogn = (has == 0).reshape(-1)  # [S]
    yx = centers.reshape(-1, k, 2)
    hw = prior_hw.reshape(-1, k, 2)
    c1 = yx - hw / 2.0                       # named 'yx_nobest' in the reference
    c2 = yx + hw / 2.0                       # named 'hw_nobest'
    if swapped_corners:
        g_y1x1 = c1 - c2 / 2.0               # swapped-corner pseudo boxes
        g_y2x2 = c1 + c2 / 2.0
    else:
        g_y1x1, g_y2x2 = c1, c2              # real anchor boxes
    a_area = jnp.prod(g_y2x2 - g_y1x1, -1)   # [S,K]
    gt_y1x1 = (gn_yx - gn_hw / 2.0)
    gt_y2x2 = (gn_yx + gn_hw / 2.0)
    inter = jnp.prod(
        jnp.minimum(g_y2x2[:, :, None, :], gt_y2x2[None, None])
        - jnp.maximum(g_y1x1[:, :, None, :], gt_y1x1[None, None]), -1)  # [S,K,G]
    garea = jnp.prod(gt_y2x2 - gt_y1x1, -1)
    iou = inter / (a_area[:, :, None] + garea[None, None] - inter)
    iou = jnp.where(valid[None, None, :], iou, -jnp.inf)
    iou_max = jnp.max(iou, -1)               # [S,K]
    ce = loss_ops.sigmoid_cross_entropy(pobj.reshape(-1, k), jnp.zeros((1, 1)))
    mask = jnp.logical_and(nogn[:, None], iou_max <= iou_thresh).astype(jnp.float32)
    return jnp.sum(ce * mask)


# --------------------------------------------------------------------- YOLOv2
def yolov2_image_loss(pred, priors_hw, gt, num_classes, downsampling_rate, scales,
                      consistent=False):
    """scales = (coord, class, obj, noobj) (YOLOv2.py:172)."""
    num_priors = len(priors_hw)
    pclass, pyx, phw, pobj = (x[0] for x in split_pred(pred[None], num_priors,
                                                       num_classes))
    fh, fw = pclass.shape[0], pclass.shape[1]
    centers, prior_hw = grid_prior_arrays(fh, fw, priors_hw)
    g = matching.unpack_gt(gt)
    gn_yx = g.yx / downsampling_rate
    gn_hw = g.hw / downsampling_rate
    yx_l, hw_l, cls_l, obj_l, _, cy, cx = _responsible_terms(
        pclass, pyx, phw, pobj, centers, prior_hw, gn_yx, gn_hw, g.label, g.valid,
        num_classes)
    noobj_l = _noobj_term(pobj, centers, prior_hw, gn_yx, gn_hw, g.valid, cy, cx,
                          0.6, swapped_corners=not consistent)
    coord_s, class_s, obj_s, noobj_s = scales
    return (coord_s * (yx_l + hw_l) + class_s * cls_l + obj_s * obj_l
            + noobj_s * noobj_l)


def yolov2_loss(pred, priors_hw, gt, num_classes, downsampling_rate, scales,
                sample_weight=None, consistent=False):
    per_image = jax.vmap(
        lambda p, g: yolov2_image_loss(p, priors_hw, g, num_classes,
                                       downsampling_rate, scales, consistent)
    )(pred, gt)
    return loss_ops.weighted_mean(per_image, sample_weight)


def yolov2_decode(pred, priors_hw, num_classes, downsampling_rate,
                  score_threshold, iou_threshold, max_boxes, pre_topk=200,
                  consistent=False):
    """Single-image decode (YOLOv2.py:182-210). Q3: hw = prior + e^p; the opt-in
    ``consistent_geometry`` extension decodes hw = prior * e^p, matching the
    training target log(g/prior)."""
    num_priors = len(priors_hw)
    pclass, pyx, phw, pobj = (x[0] for x in split_pred(pred[None], num_priors,
                                                       num_classes))
    fh, fw = pclass.shape[0], pclass.shape[1]
    centers, prior_hw = grid_prior_arrays(fh, fw, priors_hw)
    # the reference decodes center = cell + 0.5 + sigmoid(p) while training
    # teaches sigmoid(p) = frac(gn) — a half-cell decode bias; consistent mode
    # drops the +0.5 so decode inverts the training encoding
    cyx = centers.reshape(-1, 2) - (0.5 if consistent else 0.0)
    byx = cyx + jax.nn.sigmoid(pyx.reshape(-1, 2))
    if consistent:
        bhw = prior_hw.reshape(-1, 2) * jnp.exp(phw.reshape(-1, 2))
    else:
        bhw = prior_hw.reshape(-1, 2) + jnp.exp(phw.reshape(-1, 2))
    boxes = jnp.concatenate([byx - bhw / 2.0, byx + bhw / 2.0], -1) * downsampling_rate
    conf = (jax.nn.sigmoid(pclass.reshape(-1, num_classes))
            * jax.nn.sigmoid(pobj.reshape(-1, 1)))
    sel_boxes, sel_scores, sel_valid, trunc = nms.per_class_nms(
        boxes, conf.T, score_threshold, pre_topk, max_boxes, iou_threshold)
    cid = jnp.broadcast_to(jnp.arange(num_classes, dtype=jnp.int32)[:, None],
                           (num_classes, max_boxes))
    return (sel_scores.reshape(-1), sel_boxes.reshape(-1, 4), cid.reshape(-1),
            sel_valid.reshape(-1), trunc)


# --------------------------------------------------------------------- YOLOv3
def yolov3_image_loss(preds, priors_per_head, gt, num_classes, scales,
                      consistent=False):
    """3-scale loss (YOLOv3.py:115-310). ``preds``: [(H,W,K*(C+5))] per head;
    head h uses gn = gt / strides_for_cells[h] with strides_for_cells = (32, 16, 8);
    priors_per_head are already divided per quirk Q4."""
    g = matching.unpack_gt(gt)
    n = jnp.maximum(g.count.astype(jnp.float32), 1e-8)
    cell_strides = (32.0, 16.0, 8.0)
    per_head = []
    for h, (pred, priors_hw) in enumerate(zip(preds, priors_per_head)):
        num_priors = len(priors_hw)
        pclass, pyx, phw, pobj = (x[0] for x in split_pred(pred[None], num_priors,
                                                           num_classes))
        fh, fw = pclass.shape[0], pclass.shape[1]
        centers, prior_hw = grid_prior_arrays(fh, fw, priors_hw)
        gn_yx = g.yx / cell_strides[h]
        gn_hw = g.hw / cell_strides[h]
        per_head.append((pclass, pyx, phw, pobj, centers, prior_hw, gn_yx, gn_hw))

    # best-prior IoU per gt per head to route each gt to one scale
    iou_maxes = []
    cells = []
    for (pclass, pyx, phw, pobj, centers, prior_hw, gn_yx, gn_hw) in per_head:
        _, _, _, _, iou_max, cy, cx = _responsible_terms(
            pclass, pyx, phw, pobj, centers, prior_hw, gn_yx, gn_hw, g.label,
            g.valid, num_classes)
        iou_maxes.append(iou_max)
        cells.append((cy, cx))
    m1 = jnp.logical_and(iou_maxes[0] > iou_maxes[1], iou_maxes[0] > iou_maxes[2])
    m2 = jnp.logical_and(iou_maxes[1] > iou_maxes[0], iou_maxes[1] > iou_maxes[2])
    m3 = jnp.logical_not(jnp.logical_or(m1, m2))
    head_masks = [m1, m2, m3]

    coord = class_l = obj_l = noobj = 0.0
    for h, (pclass, pyx, phw, pobj, centers, prior_hw, gn_yx, gn_hw) in enumerate(per_head):
        valid_h = jnp.logical_and(g.valid, head_masks[h])
        yx_l, hw_l, cls_l, ob_l, _, cy, cx = _responsible_terms(
            pclass, pyx, phw, pobj, centers, prior_hw, gn_yx, gn_hw, g.label,
            valid_h, num_classes)
        coord += yx_l + hw_l
        class_l += cls_l
        obj_l += ob_l
        # nogn mask uses ALL gts of the scale, not just the routed ones (YOLOv3.py:126)
        all_cy, all_cx = cells[h]
        noobj += _noobj_term(pobj, centers, prior_hw, gn_yx, gn_hw, g.valid,
                             all_cy, all_cx, 0.5, swapped_corners=not consistent)
    coord_s, class_s, obj_s, noobj_s = scales
    pos = (coord_s * coord + class_s * class_l + obj_s * obj_l) / n
    neg = noobj_s * noobj / n
    return pos + neg


def yolov3_loss(preds, priors_per_head, gt, num_classes, scales,
                sample_weight=None, consistent=False):
    per_image = jax.vmap(
        lambda p1, p2, p3, g: yolov3_image_loss((p1, p2, p3), priors_per_head, g,
                                                num_classes, scales, consistent)
    )(preds[0], preds[1], preds[2], gt)
    return 0.5 * loss_ops.weighted_mean(per_image, sample_weight)  # YOLOv3.py:313


def yolov3_decode(preds, priors_per_head, num_classes, score_threshold,
                  iou_threshold, max_boxes, pre_topk=200, consistent=False):
    """Q4 pixel scales: head1 x32, head2 x32, head3 x16 (YOLOv3.py:346-348).
    ``consistent_geometry`` uses the true strides (32, 16, 8) and multiplicative
    hw so decode inverts the training encoding on every head."""
    pixel_scales = (32.0, 16.0, 8.0) if consistent else (32.0, 32.0, 16.0)
    all_boxes, all_conf = [], []
    for pred, priors_hw, px in zip(preds, priors_per_head, pixel_scales):
        num_priors = len(priors_hw)
        pclass, pyx, phw, pobj = (x[0] for x in split_pred(pred[None], num_priors,
                                                           num_classes))
        fh, fw = pclass.shape[0], pclass.shape[1]
        centers, prior_hw = grid_prior_arrays(fh, fw, priors_hw)
        cyx = centers.reshape(-1, 2) - (0.5 if consistent else 0.0)
        byx = cyx + jax.nn.sigmoid(pyx.reshape(-1, 2))
        if consistent:
            bhw = prior_hw.reshape(-1, 2) * jnp.exp(phw.reshape(-1, 2))
        else:
            bhw = prior_hw.reshape(-1, 2) + jnp.exp(phw.reshape(-1, 2))
        all_boxes.append(
            jnp.concatenate([byx - bhw / 2.0, byx + bhw / 2.0], -1) * px)
        all_conf.append(jax.nn.sigmoid(pclass.reshape(-1, num_classes))
                        * jax.nn.sigmoid(pobj.reshape(-1, 1)))
    boxes = jnp.concatenate(all_boxes, 0)
    conf = jnp.concatenate(all_conf, 0)
    sel_boxes, sel_scores, sel_valid, trunc = nms.per_class_nms(
        boxes, conf.T, score_threshold, pre_topk, max_boxes, iou_threshold)
    cid = jnp.broadcast_to(jnp.arange(num_classes, dtype=jnp.int32)[:, None],
                           (num_classes, max_boxes))
    return (sel_scores.reshape(-1), sel_boxes.reshape(-1, 4), cid.reshape(-1),
            sel_valid.reshape(-1), trunc)


# --------------------------------------------------------------------- networks
class YOLOv2Net(nn.Module):
    """DarkNet-19 + YOLOv2 head with stride-32 passthrough concat (YOLOv2.py:75-101).
    Backbone params live under scope 'backone' (the reference's scope name, kept for
    pretraining-checkpoint compatibility)."""

    final_units: int
    dtype: jnp.dtype = jnp.float32
    raw_pred: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        features, passthrough = DarkNet19(dtype=self.dtype, name="backone")(x, train)
        conv = ConvBN(1024, 3, activation=_leaky, dtype=self.dtype,
                      name="head_conv1")(features, train)
        conv = ConvBN(512, 1, activation=_leaky, dtype=self.dtype,
                      name="head_conv2")(conv, train)
        conv = ConvBN(1024, 3, activation=_leaky, dtype=self.dtype,
                      name="head_conv3")(conv, train)
        conv = ConvBN(512, 1, activation=_leaky, dtype=self.dtype,
                      name="head_conv4")(conv, train)
        conv = ConvBN(1024, 3, activation=_leaky, dtype=self.dtype,
                      name="head_conv5")(conv, train)
        conv = jnp.concatenate([passthrough, conv], -1)
        if self.raw_pred:
            # opt-in ``raw_prediction_conv``: plain conv + bias (the reference puts
            # BN on the prediction conv too — YOLOv2.py:91,353-364)
            pred = Conv(self.final_units, 1, dtype=self.dtype, name="head_pred")(conv)
        else:
            pred = ConvBN(self.final_units, 1, dtype=self.dtype,
                          name="head_pred")(conv, train)  # conv+BN, no activation
        return pred


def _nearest_resize(x, out_h, out_w):
    """tf.image.resize_nearest_neighbor (align_corners=False)."""
    h, w = x.shape[1], x.shape[2]
    yi = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    xi = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[:, yi][:, :, xi]


class _YOLOv3Header(nn.Module):
    filters: int
    final_units: int
    has_pyramid: bool
    dtype: jnp.dtype
    raw_pred: bool = False

    @nn.compact
    def __call__(self, bottom, pyramid, train: bool):
        if self.has_pyramid:
            conv = _DarkConv(self.filters, 1, is_activation=False, dtype=self.dtype,
                             name="pyramid_conv")(pyramid, train)
            conv = _nearest_resize(conv, bottom.shape[1], bottom.shape[2])
            conv = jnp.concatenate([bottom, conv], -1)
        else:
            conv = bottom
        c = _DarkConv(self.filters // 2, 1, dtype=self.dtype, name="conv1")(conv, train)
        c = _DarkConv(self.filters, 3, dtype=self.dtype, name="conv2")(c, train)
        c = _DarkConv(self.filters // 2, 1, dtype=self.dtype, name="conv3")(c, train)
        c = _DarkConv(self.filters, 3, dtype=self.dtype, name="conv4")(c, train)
        top_down = _DarkConv(self.filters // 2, 1, dtype=self.dtype, name="conv5")(c, train)
        c = _DarkConv(self.filters, 3, dtype=self.dtype, name="conv6")(top_down, train)
        if self.raw_pred:
            # opt-in ``raw_prediction_conv`` extension: plain conv + bias. The
            # reference's BN + LeakyReLU on the prediction conv (quirk Q5,
            # YOLOv3.py:416,494-507) compresses negative logits 10x, which blocks
            # objectness/class suppression from converging — measured mAP 0.01 vs
            # 0.8+ with a raw head on the synthetic convergence protocol.
            pred = Conv(self.final_units, 1, dtype=self.dtype, name="pred")(c)
        else:
            # Q5: the prediction conv has BN + LeakyReLU (default is_activation=True)
            pred = _DarkConv(self.final_units, 1, dtype=self.dtype,
                             name="pred")(c, train)
        return pred, top_down


class YOLOv3Net(nn.Module):
    final_units: int
    dtype: jnp.dtype = jnp.float32
    raw_pred: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        b5, b4, b3 = DarkNet53(dtype=self.dtype, name="backone")(x, train)
        pred1, td = _YOLOv3Header(1024, self.final_units, False, self.dtype,
                                  self.raw_pred, name="pyd1")(b5, None, train)
        pred2, td = _YOLOv3Header(256, self.final_units, True, self.dtype,
                                  self.raw_pred, name="pyd2")(b4, td, train)
        pred3, _ = _YOLOv3Header(128, self.final_units, True, self.dtype,
                                 self.raw_pred, name="pyd3")(b3, td, train)
        return pred1, pred2, pred3
