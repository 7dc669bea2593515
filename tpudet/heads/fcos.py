"""FCOS head: anchor-free FPN with centerness (reference: FCOS.py).

Quirks preserved (SURVEY.md §6.1): Q10 — gts route to pyramid levels by
``sqrt(h*w)`` bands [0,64],[64,128],[128,256],[256,512],[512,inf) in PIXELS with
inclusive boundaries (a gt exactly on a boundary contributes to both levels);
Q9 — inference emits only classes 0..num_classes-2 (the NMS loop covers
``num_classes - 1`` classes, FCOS.py:252); the head towers are weight-shared across
levels (AUTO_REUSE, FCOS.py:350-364) and there is no per-level learnable scale.

The loss transcribes FCOS.py:266-348: strictly-inside location masks, min-area tie
breaking (ties keep ALL minima via the equality mask), -log(IoU) regression,
binary-CE centerness over the whole map, alpha=0.25 focal-ish heatmap loss, all
normalized by sum(heatmap_gt). A zero-coverage level contributes 0 (the reference
guards only the no-routed-gt case and would produce inf on covered-but-empty
heatmaps; we guard the division, documented deviation).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.backbones.resnet import PreActResNet
from tpudet.nn.layers import BNActConv, resize_bilinear
from tpudet.ops import matching, nms

STRIDES = (8, 16, 32, 64, 128)
SIZE_BANDS = ((0.0, 64.0), (64.0, 128.0), (128.0, 256.0), (256.0, 512.0),
              (512.0, jnp.inf))


class FCOSHead(nn.Module):
    """Weight-shared classification/centerness + regression towers (GN pre-act)."""

    num_classes: int
    feature_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, train: bool):
        import math

        bias0 = -math.log((1.0 - 0.01) / 0.01)
        c = f
        for j in range(4):
            c = BNActConv(self.feature_size, 3, 1, norm="gn", dtype=self.dtype,
                          name=f"cls_conv{j}")(c, train)
        pconf = BNActConv(self.num_classes, 3, 1, norm="gn", bias_init_const=bias0,
                          dtype=self.dtype, name="cls_pred")(c, train)
        pcenter = BNActConv(1, 3, 1, norm="gn", bias_init_const=bias0,
                            dtype=self.dtype, name="center_pred")(c, train)
        r = f
        for j in range(4):
            r = BNActConv(self.feature_size, 3, 1, norm="gn", dtype=self.dtype,
                          name=f"reg_conv{j}")(r, train)
        preg = jnp.exp(BNActConv(4, 3, 1, norm="gn", dtype=self.dtype,
                                 name="reg_pred")(r, train).astype(jnp.float32))
        return (pconf.astype(jnp.float32), preg, pcenter.astype(jnp.float32))


class FCOSNet(nn.Module):
    num_classes: int
    block_list: tuple = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        e3, e4, e5 = PreActResNet(block_list=self.block_list, init_conv_filters=16,
                                  width_base=16, is_bottleneck=True, norm="gn",
                                  dtype=self.dtype, name="backone")(x, train)
        # 'pyramid' scope: 1x1 projections then the FPN with ANOTHER 1x1 lateral
        c3 = BNActConv(256, 1, 1, norm="gn", dtype=self.dtype, name="c3_proj")(e3, train)
        c4 = BNActConv(256, 1, 1, norm="gn", dtype=self.dtype, name="c4_proj")(e4, train)
        c5 = BNActConv(256, 1, 1, norm="gn", dtype=self.dtype, name="c5_proj")(e5, train)
        p5 = BNActConv(256, 3, 1, norm="gn", dtype=self.dtype, name="p5_conv")(c5, train)
        lat4 = BNActConv(256, 1, 1, norm="gn", dtype=self.dtype,
                         name="p4_lateral")(c4, train)
        td4 = lat4 + resize_bilinear(p5, lat4.shape[1], lat4.shape[2])
        p4 = BNActConv(256, 3, 1, norm="gn", dtype=self.dtype, name="p4_conv")(td4, train)
        lat3 = BNActConv(256, 1, 1, norm="gn", dtype=self.dtype,
                         name="p3_lateral")(c3, train)
        td3 = lat3 + resize_bilinear(td4, lat3.shape[1], lat3.shape[2])
        p3 = BNActConv(256, 3, 1, norm="gn", dtype=self.dtype, name="p3_conv")(td3, train)
        p6 = BNActConv(256, 3, 2, norm="gn", dtype=self.dtype, name="p6_conv")(p5, train)
        p7 = BNActConv(256, 3, 2, norm="gn", dtype=self.dtype, name="p7_conv")(p6, train)
        head = FCOSHead(self.num_classes, dtype=self.dtype, name="head")
        return [head(p, train) for p in (p3, p4, p5, p6, p7)]


def _level_loss(pconf, preg, pcenter, g: matching.GtArrays, band, stride,
                num_classes, consistent: bool = False):
    fh, fw = pconf.shape[0], pconf.shape[1]
    size = jnp.sqrt(jnp.maximum(g.hw[:, 0] * g.hw[:, 1], 0.0))
    routed = jnp.logical_and(
        g.valid, jnp.logical_and(size >= band[0], size <= band[1]))

    gy = g.yx[:, 0] / stride
    gx = g.yx[:, 1] / stride
    gh = g.hw[:, 0] / stride
    gw = g.hw[:, 1] / stride
    gy1, gy2 = gy - gh / 2.0, gy + gh / 2.0
    gx1, gx2 = gx - gw / 2.0, gx + gw / 2.0

    if consistent or os.environ.get("TPUDET_SSD_CONF_LAYOUT", "ca") == "ca":
        return _level_loss_gp(pconf, preg, pcenter, g, routed,
                              (gy1, gy2, gx1, gx2), num_classes,
                              consistent=consistent)

    yy = jnp.arange(fh, dtype=jnp.float32)[:, None, None]
    xx = jnp.arange(fw, dtype=jnp.float32)[None, :, None]
    dist_l = xx - gx1[None, None, :]
    dist_r = gx2[None, None, :] - xx
    dist_t = yy - gy1[None, None, :]
    dist_b = gy2[None, None, :] - yy
    inside = (dist_t > 0.0) & (dist_b > 0.0) & (dist_l > 0.0) & (dist_r > 0.0)
    heatmask = jnp.logical_and(inside, routed[None, None, :]).astype(jnp.float32)
    dist_l = dist_l * heatmask
    dist_r = dist_r * heatmask
    dist_t = dist_t * heatmask
    dist_b = dist_b * heatmask
    loc = jnp.max(heatmask, axis=-1)                       # [fh, fw]
    dist_area = (dist_l + dist_r) * (dist_t + dist_b)
    dist_area_ = dist_area + (1.0 - heatmask) * 1e8
    area_min = jnp.min(dist_area_, axis=-1, keepdims=True)
    dist_mask = (dist_area == area_min).astype(jnp.float32) * loc[:, :, None]
    dl = jnp.max(dist_l * dist_mask, -1)
    dr = jnp.max(dist_r * dist_mask, -1)
    dt = jnp.max(dist_t * dist_mask, -1)
    db = jnp.max(dist_b * dist_mask, -1)

    pl, pr, pt, pb = (preg[..., i] for i in range(4))
    inter = (jnp.minimum(dl, pl) + jnp.minimum(dr, pr)) * \
            (jnp.minimum(dt, pt) + jnp.minimum(db, pb))
    union = (dl + dr) * (dt + db) + (pl + pr) * (pt + pb) - inter
    iou = inter / (union + 1e-12)
    iou_loss = jnp.sum(-jnp.log(iou + 1e-12) * loc)

    lr_min, lr_max = jnp.minimum(dl, dr), jnp.maximum(dl, dr)
    tb_min, tb_max = jnp.minimum(dt, db), jnp.maximum(dt, db)
    center_gt = jnp.sqrt(lr_min * tb_min / (lr_max * tb_max + 1e-12))
    cp = pcenter[..., 0]
    center_loss = jnp.sum(jnp.maximum(cp, 0.0) - cp * center_gt
                          + jnp.log1p(jnp.exp(-jnp.abs(cp))))

    heat_gt = jnp.stack([
        jnp.max(jnp.where((g.label == ci)[None, None, :], heatmask, 0.0), -1)
        for ci in range(num_classes)
    ], -1)
    s = jax.nn.sigmoid(pconf)
    log_s = jax.nn.log_sigmoid(pconf)
    log_1ms = -pconf + log_s
    pos = -0.25 * jnp.square(1.0 - s) * log_s * heat_gt
    neg = -0.25 * jnp.square(s) * log_1ms * (1.0 - heat_gt)
    heat_loss = jnp.sum(pos) + jnp.sum(neg)

    denom = jnp.sum(heat_gt)
    has_gt = jnp.any(routed)
    total = (iou_loss + heat_loss + center_loss) / jnp.maximum(denom, 1e-8)
    return jnp.where(jnp.logical_and(has_gt, denom > 0.0), total, 0.0)


def _level_loss_gp(pconf, preg, pcenter, g: matching.GtArrays, routed, gboxes,
                   num_classes, consistent: bool = False):
    """The level loss in TPU-lane-friendly layouts: the per-gt mask planes as
    [G, P=fh*fw] (G on sublanes, every cell on lanes) instead of [fh, fw, G]
    (minor gt-pad axis padded to 128 lanes, ~5x HBM waste per materialization
    of the ~10 mask/distance planes), and the focal heatmap block as [C, P]
    instead of [fh, fw, C]. heat_gt's per-class Python loop becomes one 0/1
    one-hot matmul on the MXU ([C,G] @ [G,P] > 0 — exact for 0/1 masks).
    Same math term-for-term as the [fh, fw, ...] form above; values agree to
    fp reduction order (tests/test_ssd_conf_layout.py::test_fcos_loss_ca).
    BASELINE.md round-4 perf note has the layout-lever context."""
    gy1, gy2, gx1, gx2 = gboxes
    fh, fw = pconf.shape[0], pconf.shape[1]
    p = fh * fw
    yy = jnp.repeat(jnp.arange(fh, dtype=jnp.float32), fw)  # [P]
    xx = jnp.tile(jnp.arange(fw, dtype=jnp.float32), fh)    # [P]
    dist_l = xx[None, :] - gx1[:, None]                     # [G, P]
    dist_r = gx2[:, None] - xx[None, :]
    dist_t = yy[None, :] - gy1[:, None]
    dist_b = gy2[:, None] - yy[None, :]
    inside = (dist_t > 0.0) & (dist_b > 0.0) & (dist_l > 0.0) & (dist_r > 0.0)
    heatmask = jnp.logical_and(inside, routed[:, None]).astype(jnp.float32)
    dist_l = dist_l * heatmask
    dist_r = dist_r * heatmask
    dist_t = dist_t * heatmask
    dist_b = dist_b * heatmask
    loc = jnp.max(heatmask, axis=0)                         # [P]
    dist_area = (dist_l + dist_r) * (dist_t + dist_b)
    dist_area_ = dist_area + (1.0 - heatmask) * 1e8
    area_min = jnp.min(dist_area_, axis=0, keepdims=True)
    dist_mask = (dist_area == area_min).astype(jnp.float32) * loc[None, :]
    dl = jnp.max(dist_l * dist_mask, 0)                     # [P]
    dr = jnp.max(dist_r * dist_mask, 0)
    dt = jnp.max(dist_t * dist_mask, 0)
    db = jnp.max(dist_b * dist_mask, 0)

    pl, pr, pt, pb = (preg[..., i].reshape(p) for i in range(4))
    inter = (jnp.minimum(dl, pl) + jnp.minimum(dr, pr)) * \
            (jnp.minimum(dt, pt) + jnp.minimum(db, pb))
    union = (dl + dr) * (dt + db) + (pl + pr) * (pt + pb) - inter
    iou = inter / (union + 1e-12)
    iou_loss = jnp.sum(-jnp.log(iou + 1e-12) * loc)

    lr_min, lr_max = jnp.minimum(dl, dr), jnp.maximum(dl, dr)
    tb_min, tb_max = jnp.minimum(dt, db), jnp.maximum(dt, db)
    center_gt = jnp.sqrt(lr_min * tb_min / (lr_max * tb_max + 1e-12))
    cp = pcenter[..., 0].reshape(p)
    center_ce = jnp.maximum(cp, 0.0) - cp * center_gt \
        + jnp.log1p(jnp.exp(-jnp.abs(cp)))
    # consistent_objective: centerness CE over POSITIVE locations only (the
    # paper's form) vs the reference's every-cell sum (FCOS.py:322-330) —
    # the counterfactual for the Q-FCOS-objective ceiling claim (PARITY.md)
    center_loss = jnp.sum(center_ce * loc) if consistent else jnp.sum(center_ce)

    label_oh = (
        jnp.arange(num_classes, dtype=jnp.int32)[:, None]
        == g.label[None, :].astype(jnp.int32)
    ).astype(jnp.float32)                                   # [C, G]
    heat_gt = (jnp.matmul(label_oh, heatmask) > 0.0).astype(jnp.float32)  # [C, P]
    pconf_cp = pconf.reshape(p, num_classes).T              # [C, P]
    s = jax.nn.sigmoid(pconf_cp)
    log_s = jax.nn.log_sigmoid(pconf_cp)
    log_1ms = -pconf_cp + log_s
    # consistent_objective: asymmetric focal alpha (0.25 on positives, 0.75 on
    # negatives — the standard form) vs the reference's symmetric 0.25/0.25
    neg_alpha = 0.75 if consistent else 0.25
    pos = -0.25 * jnp.square(1.0 - s) * log_s * heat_gt
    neg = -neg_alpha * jnp.square(s) * log_1ms * (1.0 - heat_gt)
    heat_loss = jnp.sum(pos) + jnp.sum(neg)

    if consistent:
        # raw per-level terms; fcos_image_loss normalizes ONCE by the image's
        # total positive-location count (the paper's N_pos), not per level
        return iou_loss, heat_loss, center_loss, jnp.sum(loc)
    denom = jnp.sum(heat_gt)
    has_gt = jnp.any(routed)
    total = (iou_loss + heat_loss + center_loss) / jnp.maximum(denom, 1e-8)
    return jnp.where(jnp.logical_and(has_gt, denom > 0.0), total, 0.0)


def fcos_image_loss(level_preds, gt, num_classes, consistent: bool = False):
    g = matching.unpack_gt(gt)
    if consistent:
        # opt-in `consistent_objective` (non-reference, documented in PARITY.md):
        # the paper's actual loss — focal cls + IoU reg + positives-only
        # centerness CE, all normalized by the image's total N_pos
        iou_l = heat_l = center_l = num_pos = 0.0
        for (pconf, preg, pcenter), band, stride in zip(level_preds, SIZE_BANDS,
                                                        STRIDES):
            i_l, h_l, c_l, n_p = _level_loss(pconf, preg, pcenter, g, band,
                                             float(stride), num_classes,
                                             consistent=True)
            iou_l, heat_l = iou_l + i_l, heat_l + h_l
            center_l, num_pos = center_l + c_l, num_pos + n_p
        return (iou_l + heat_l + center_l) / jnp.maximum(num_pos, 1.0)
    loss = 0.0
    for (pconf, preg, pcenter), band, stride in zip(level_preds, SIZE_BANDS, STRIDES):
        loss = loss + _level_loss(pconf, preg, pcenter, g, band, float(stride),
                                  num_classes)
    return loss


def fcos_loss(level_preds, gt, num_classes, sample_weight=None,
              consistent: bool = False):
    per_image = jax.vmap(lambda *flat: fcos_image_loss(
        [(flat[3 * i], flat[3 * i + 1], flat[3 * i + 2]) for i in range(len(level_preds))],
        flat[-1], num_classes, consistent=consistent
    ))(*[t for lvl in level_preds for t in lvl], gt)
    from tpudet.ops import losses as loss_ops
    return loss_ops.weighted_mean(per_image, sample_weight)


def fcos_decode(level_preds, num_classes, score_threshold, iou_threshold, max_boxes,
                pre_topk=200, emit_all_classes: bool = False):
    """Single-image decode (FCOS.py:196-264); Q9: class num_classes-1 never emitted
    (``emit_all_classes`` — set by the opt-in ``consistent_objective`` mode —
    covers all ``num_classes`` instead)."""
    all_conf, all_boxes = [], []
    for (pconf, preg, pcenter), stride in zip(level_preds, STRIDES):
        fh, fw = pconf.shape[0], pconf.shape[1]
        conf = (jax.nn.sigmoid(pconf) * jax.nn.sigmoid(pcenter)).reshape(-1, num_classes)
        yy, xx = jnp.meshgrid(jnp.arange(fh, dtype=jnp.float32),
                              jnp.arange(fw, dtype=jnp.float32), indexing="ij")
        y1 = yy - preg[..., 2]
        y2 = yy + preg[..., 3]
        x1 = xx - preg[..., 0]
        x2 = xx + preg[..., 1]
        boxes = jnp.stack([y1, x1, y2, x2], -1).reshape(-1, 4) * float(stride)
        all_conf.append(conf)
        all_boxes.append(boxes)
    conf = jnp.concatenate(all_conf, 0)
    boxes = jnp.concatenate(all_boxes, 0)
    c_emit = num_classes if emit_all_classes else num_classes - 1  # Q9
    sel_boxes, sel_scores, sel_valid, trunc = nms.per_class_nms(
        boxes, conf[:, :c_emit].T, score_threshold, pre_topk, max_boxes,
        iou_threshold)
    cid = jnp.broadcast_to(jnp.arange(c_emit, dtype=jnp.int32)[:, None],
                           (c_emit, max_boxes))
    return (sel_scores.reshape(-1), sel_boxes.reshape(-1, 4), cid.reshape(-1),
            sel_valid.reshape(-1), trunc)
