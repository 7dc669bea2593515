"""SSD head: multi-scale anchor regression with hard-negative mining.

Semantics transcribed from /root/reference/SSD300.py (loss :345-453, decode :156-190,
anchors :112-119 + :323-343), re-expressed fixed-shape for TPU:

  * per-image assignment is a masked dense computation ``vmap``ped over the batch
    (replacing the reference's ``tf.while_loop`` + boolean_mask/SparseTensor machinery);
  * hard-negative mining is NMS-on-loss over anchor boxes (quirk Q15) implemented with
    the fixed-shape greedy NMS in tpudet.ops.nms, with the data-dependent
    ``min(3*num_pos, num_neg)`` selection count handled via ``num_select`` masking;
  * inference decode + per-class NMS runs entirely on device with padded outputs.

Matching rules (SSD300.py:378-434):
  1. every valid gt claims its best-IoU anchor ("best set"; duplicates allowed in the
     loss rows exactly like the reference's per-gt gather);
  2. anchors not in the best set are positive if their best gt IoU > 0.5, assigned to
     that gt; the rest are negatives;
  3. negatives are mined by NMS(iou 0.7) with per-anchor background CE as score,
     keeping at most 3x the positive-row count; their mean CE is the negative loss;
  4. positive conf/coord losses are means over the concatenated best+positive rows.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import ConvBN
from tpudet.ops import anchors as anchor_ops
from tpudet.ops import boxes as box_ops
from tpudet.ops import losses as loss_ops
from tpudet.ops import matching, nms


class AnchorSet(NamedTuple):
    y1x1: jnp.ndarray  # [A, 2]
    y2x2: jnp.ndarray  # [A, 2]
    yx: jnp.ndarray    # [A, 2]
    hw: jnp.ndarray    # [A, 2]


SSD_ASPECT_RATIOS = ([2, 1 / 2], [2, 1 / 2, 3, 1 / 3], [2, 1 / 2, 3, 1 / 3],
                     [2, 1 / 2, 3, 1 / 3], [2, 1 / 2], [2, 1 / 2])


def build_anchors(input_size: int, feat_shapes: Sequence[Sequence[int]],
                  aspect_ratios: Sequence[Sequence[float]] | None = None,
                  scale_pairs: Sequence[Sequence[float]] | None = None) -> AnchorSet:
    """Anchor set over the actual head feature shapes (SSD300.py:112-127).

    Note the reference's extra stages yield feature maps 38/19/10/5/5/3 for SSD300
    (conv10_2 has stride 1) — 8828 anchors, a deviation from the canonical 8732.
    """
    n = len(feat_shapes)
    if aspect_ratios is None:
        aspect_ratios = SSD_ASPECT_RATIOS[:n]
    if scale_pairs is None:
        scale_pairs = anchor_ops.ssd_scale_pairs(float(input_size), n)
    levels = []
    for (fh, fw), pair, ars in zip(feat_shapes, scale_pairs, aspect_ratios):
        priors = anchor_ops.ssd_priors(pair, ars)
        levels.append(anchor_ops.grid_anchors(
            fh, fw, priors, input_size / fh, input_size / fw))
    arrs = anchor_ops.concat_levels(levels)
    return AnchorSet(*(jnp.asarray(a) for a in arrs))


def num_priors_per_level(aspect_ratios: Sequence[Sequence[float]]):
    """k = len(ratios) + 2 (two square priors + one per ratio), SSD300.py:85-90."""
    return [len(ars) + 2 for ars in aspect_ratios]


class SSDPredHead(nn.Module):
    """Per-level 3x3 ConvBN prediction layers emitting ``k*(C+1+4)`` channels
    (SSD300.py:85-90; BN on heads is quirk Q6)."""

    num_classes_total: int  # C+1 (with background)
    priors_per_level: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool):
        preds = []
        for i, (f, k) in enumerate(zip(feats, self.priors_per_level)):
            preds.append(ConvBN(k * (self.num_classes_total + 4), 3, dtype=self.dtype,
                                name=f"pred{i + 1}")(f, train))
        return preds


def flatten_preds(preds, num_classes_total: int):
    """[B,H,W,K*(C+5)] per level -> concatenated (pconf [B,A,C+1], pyx, phw).

    Channel layout per prior: [conf(C+1), yx(2), hw(2)] (SSD300.py:316-321).
    """
    confs, yxs, hws = [], [], []
    for p in preds:
        b = p.shape[0]
        p = p.reshape(b, -1, num_classes_total + 4)
        confs.append(p[..., :num_classes_total])
        yxs.append(p[..., num_classes_total:num_classes_total + 2])
        hws.append(p[..., num_classes_total + 2:])
    return (jnp.concatenate(confs, 1).astype(jnp.float32),
            jnp.concatenate(yxs, 1).astype(jnp.float32),
            jnp.concatenate(hws, 1).astype(jnp.float32))


def _conf_ce_terms(pconf, best_anchor, g_label, po_label, num_classes_total: int):
    """The three CE readouts off ONE log-softmax of the [A, C] conf logits:
    per-gt best-anchor CE, per-anchor assigned-label CE, per-anchor background CE.

    Two layouts, selected by TPUDET_SSD_CONF_LAYOUT (read at trace time):

    * ``ac`` — the straightforward [A, C] form (log_softmax over the minor axis).
    * ``ca`` (default) — transpose to [C, A] first so the 8k-anchor axis rides the TPU lane
      dimension instead of the C=21 class axis (which pads to 128 lanes, a 6x
      HBM-footprint waste on every [A, C] materialization in fwd AND bwd). The
      softmax reduces over sublanes; label CEs become masked sublane reductions;
      the best-anchor gather is an exact one-hot selection matmul at
      ``Precision.HIGHEST`` (same argument as matching.gather_gt_rows: the 3-way
      bf16 split of an f32 selected by 0/1 weights re-sums exactly).

    Both produce identical values up to fp reduction order of the 21-term
    logsumexp (tests/test_ssd_conf_layout.py asserts <= 1e-6 rel).
    """
    if os.environ.get("TPUDET_SSD_CONF_LAYOUT", "ca") == "ca":
        c = num_classes_total
        pconf_ca = pconf.T  # [C, A]
        m = jnp.max(pconf_ca, axis=0)
        logz = m + jnp.log(jnp.sum(jnp.exp(pconf_ca - m[None, :]), axis=0))
        log_probs_ca = pconf_ca - logz[None, :]
        cls_plane = jnp.arange(c, dtype=jnp.int32)[:, None]
        po_oh = po_label[None, :].astype(jnp.int32) == cls_plane
        po_ce = -jnp.sum(jnp.where(po_oh, log_probs_ca, 0.0), axis=0)
        neg_ce = -log_probs_ca[c - 1]
        a = pconf.shape[0]
        best_oh = (
            best_anchor[:, None] == jnp.arange(a, dtype=best_anchor.dtype)
        ).astype(jnp.float32)  # [G, A]
        best_lp = jnp.einsum("ga,ca->gc", best_oh, log_probs_ca,
                             precision=jax.lax.Precision.HIGHEST)
        best_ce = loss_ops.ce_from_log_probs(best_lp, g_label)
        return best_ce, po_ce, neg_ce
    log_probs = loss_ops.log_softmax(pconf)  # one softmax serves all three CE terms
    best_ce = loss_ops.ce_from_log_probs(log_probs[best_anchor], g_label)
    po_ce = loss_ops.ce_from_log_probs(log_probs, po_label)
    neg_ce = -log_probs[:, num_classes_total - 1]
    return best_ce, po_ce, neg_ce


def _image_terms(pyx, phw, pconf, anc: AnchorSet, gt, assign, num_classes_total: int):
    """Per-image SSD matching terms (SSD300.py:345-453) on the PRE-COMPUTED
    assignment (one batched Pallas program on TPU — matching.assign_batch);
    the hard-negative NMS also runs batched outside the vmap. Returns
    (pos_loss, neg_ce [A], neg_mask [A], chosen_num_neg)."""
    g = matching.unpack_gt(gt)
    best_anchor, best_agiou, rg, best_set = assign
    t_yx, t_hw = box_ops.encode(g.yx, jnp.maximum(g.hw, 1e-8),
                                anc.yx[best_anchor], anc.hw[best_anchor])
    best_coord = (
        jnp.sum(loss_ops.smooth_l1(pyx[best_anchor] - t_yx), -1)
        + jnp.sum(loss_ops.smooth_l1(phw[best_anchor] - t_hw), -1)
    )
    vmask = g.valid.astype(jnp.float32)

    # --- other anchors: IoU > 0.5 positives / negatives ---
    other = jnp.logical_not(best_set)
    pos_other = jnp.logical_and(other, best_agiou > 0.5)
    neg = jnp.logical_and(other, jnp.logical_not(pos_other))

    po_label, rg_yx, rg_hw = matching.gather_gt_rows(rg, g.label, g.yx, g.hw)
    best_ce, po_ce, neg_ce = _conf_ce_terms(pconf, best_anchor, g.label, po_label,
                                            num_classes_total)
    po_t_yx, po_t_hw = box_ops.encode(rg_yx, jnp.maximum(rg_hw, 1e-8),
                                      anc.yx, anc.hw)
    po_coord = (
        jnp.sum(loss_ops.smooth_l1(pyx - po_t_yx), -1)
        + jnp.sum(loss_ops.smooth_l1(phw - po_t_hw), -1)
    )
    pos_f = pos_other.astype(jnp.float32)
    num_pos_int = g.count + jnp.sum(pos_other.astype(jnp.int32))
    denom = jnp.maximum(num_pos_int.astype(jnp.float32), 1e-8)

    pos_conf_loss = (jnp.sum(best_ce * vmask) + jnp.sum(po_ce * pos_f)) / denom
    pos_coord_loss = (jnp.sum(best_coord * vmask) + jnp.sum(po_coord * pos_f)) / denom

    # --- hard-negative candidates: NMS-on-loss runs batched outside the vmap (Q15) ---
    num_neg = jnp.sum(neg.astype(jnp.int32))
    chosen = jnp.minimum(num_neg, 3 * num_pos_int)

    return pos_conf_loss + pos_coord_loss, neg_ce, neg, chosen


def ssd_loss(pconf, pyx, phw, anc: AnchorSet, gt, num_classes_total: int,
             neg_sel_cap: int = 384, sample_weight=None):
    """Batched SSD loss: mean of per-image losses (SSD300.py:128-148). The
    hard-negative mining NMS is one batched device program over the shared anchor
    boxes (a Pallas kernel on TPU).

    ``neg_sel_cap`` is the static bound on the reference's DYNAMIC mining budget
    ``chosen_num_neg = min(num_neg, 3*num_pos)`` (SSD300.py:426-434): selections
    beyond the cap are dropped, so for exact loss parity it must be >= 3*num_pos
    of the densest image. 384 covers typical VOC images (tens of positives);
    raise via config key 'hard_neg_cap' for crowded scenes."""
    gt_y1x1, gt_y2x2 = box_ops.center_to_corners(gt[..., 0:2], gt[..., 2:4])
    gt_valid = jax.vmap(
        lambda t: jnp.arange(t.shape[0], dtype=jnp.int32)
        < matching.valid_gt_count(t))(gt)
    assign = matching.assign_batch(gt_y1x1, gt_y2x2, gt_valid,
                                   anc.y1x1, anc.y2x2)
    pos_loss, neg_ce, neg, chosen = jax.vmap(
        lambda y, h, c, g, asg: _image_terms(y, h, c, anc, g, asg,
                                             num_classes_total)
    )(pyx, phw, pconf, gt, assign)
    anc_corners = jnp.concatenate([anc.y1x1, anc.y2x2], -1)
    sel, sel_valid = nms.batched_greedy_nms(
        anc_corners, neg_ce, chosen, neg_sel_cap, 0.7, active=neg)
    sel_f = sel_valid.astype(jnp.float32)
    sel_ce = jnp.take_along_axis(neg_ce, sel, axis=1)
    neg_loss = jnp.sum(sel_ce * sel_f, -1) / jnp.maximum(jnp.sum(sel_f, -1), 1.0)
    return loss_ops.weighted_mean(pos_loss + neg_loss, sample_weight)


def ssd_decode(pconf, pyx, phw, anc: AnchorSet, score_threshold: float,
               iou_threshold: float, max_boxes: int, pre_topk: int = 200):
    """Single-image inference decode (SSD300.py:156-190), fully on device.

    Args are the [A, ...] flattened head outputs for ONE image. Returns padded
    ``(scores [C*max], boxes [C*max, 4], class_id [C*max], valid [C*max])`` where the
    per-class blocks are concatenated in class order like the reference.
    """
    num_classes_total = pconf.shape[-1]
    if os.environ.get("TPUDET_SSD_CONF_LAYOUT", "ca") == "ca":
        # score softmax/argmax in [C, A] (per_class_nms wants [C, A] anyway;
        # the [A, C=21] form pads its minor class axis to 128 TPU lanes)
        conf_ca = jax.nn.softmax(pconf.T, axis=0)
        arg = jnp.argmax(conf_ca, axis=0)
        class_scores = conf_ca[: num_classes_total - 1]
    else:
        conf = jax.nn.softmax(pconf, axis=-1)
        arg = jnp.argmax(conf, axis=-1)
        class_scores = conf[:, : num_classes_total - 1].T  # [C, A]
    not_bg = arg < num_classes_total - 1  # drop argmax==background rows (:160-162)
    byx, bhw = box_ops.decode(pyx, phw, anc.yx, anc.hw)
    y1x1, y2x2 = box_ops.center_to_corners(byx, bhw)
    boxes4 = jnp.concatenate([y1x1, y2x2], -1)
    sel_boxes, sel_scores, sel_valid, trunc = nms.per_class_nms(
        boxes4, class_scores, score_threshold, pre_topk, max_boxes, iou_threshold,
        class_active=not_bg,
    )
    c = num_classes_total - 1
    class_id = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None],
                                (c, max_boxes))
    return (sel_scores.reshape(-1), sel_boxes.reshape(-1, 4),
            class_id.reshape(-1), sel_valid.reshape(-1), trunc)


class SSDNet(nn.Module):
    """Full SSD network: VGG extractor + conv4_3 L2-norm + prediction heads.

    Returns the per-level prediction tensors; anchor building and loss/decode are pure
    functions over them (see module docstring).
    """

    num_classes_total: int
    aspect_ratios: Sequence[Sequence[float]] = SSD_ASPECT_RATIOS
    extra_widths: Sequence[int] = (512, 256, 256, 256)
    extra_strides: Sequence[int] = (2, 2, 1, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from tpudet.nn.backbones.vgg import SSDVGGExtractor
        from tpudet.nn.layers import L2NormScale

        feats = SSDVGGExtractor(extra_widths=self.extra_widths,
                                extra_strides=self.extra_strides,
                                dtype=self.dtype, name="feature_extractor")(x, train)
        feats[0] = L2NormScale(init=20.0, name="l2_norm")(feats[0])
        preds = SSDPredHead(self.num_classes_total,
                            num_priors_per_level(self.aspect_ratios),
                            dtype=self.dtype, name="regressor")(feats, train)
        return preds
