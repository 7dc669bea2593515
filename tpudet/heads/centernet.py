"""CenterNet head: keypoint heatmap + offset + size, peak-NMS decode
(reference: CenterNet.py).

Loss (CenterNet.py:187-251):
  * gaussian penalty reduction with ONE shared sigma — the reference's
    ``_gaussian_radius`` takes the GLOBAL min over all three CornerNet radii of all
    gts (``tf.reduce_min([r1, r2, r3])`` with no axis, CenterNet.py:270) — reproduced;
  * penalty-reduced focal: pos ``-(1-s)^2 log s`` at center cells, neg
    ``-(1-gauss)^4 s^2 log(1-s)`` elsewhere, each summed and divided by num_gt;
  * L1 offset + 0.1 * L1 size at the gt center cells (means over [n, 2]).

Decode (CenterNet.py:158-185): per-cell argmax class, 3x3 maxpool peak equality mask,
score filter + global top-k; NO box NMS.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.backbones.dla import DLABackbone, DLAUp
from tpudet.nn.layers import ConvBN, max_pool_same
from tpudet.ops import matching


class CenterNetNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        s4, s5, s6 = DLABackbone(dtype=self.dtype, name="backone")(x, train)
        features = DLAUp(dtype=self.dtype, name="upsampling")(s4, s5, s6, train)
        keypoints = ConvBN(self.num_classes, 3, dtype=self.dtype,
                           name="keypoints")(features, train)
        offset = ConvBN(2, 3, dtype=self.dtype, name="offset")(features, train)
        size = ConvBN(2, 3, dtype=self.dtype, name="size")(features, train)
        return (keypoints.astype(jnp.float32), offset.astype(jnp.float32),
                size.astype(jnp.float32))


def _gaussian_sigma(h, w, valid, min_overlap=0.7):
    """Global-min CornerNet radius (CenterNet.py:254-270)."""
    b1 = h + w
    c1 = w * h * (1.0 - min_overlap) / (1.0 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 ** 2 - 4.0 * c1, 0.0))) / 2.0
    b2 = 2.0 * (h + w)
    c2 = (1.0 - min_overlap) * w * h
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 ** 2 - 16.0 * c2, 0.0))) / 2.0
    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (h + w)
    c3 = (min_overlap - 1.0) * w * h
    # quirk: the reference divides by 2, NOT 2*a3 (CenterNet.py:268-270)
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4.0 * a3 * c3, 0.0))) / 2.0
    all_r = jnp.stack([r1, r2, r3])  # [3, G]
    return jnp.min(jnp.where(valid[None, :], all_r, jnp.inf))


def centernet_image_loss(keypoints, offset, size, gt, num_classes, stride=4.0):
    """keypoints [h,w,C], offset/size [h,w,2]; gt [G,5] padded."""
    h, w = keypoints.shape[0], keypoints.shape[1]
    g = matching.unpack_gt(gt)
    nyx = g.yx / stride
    nhw = g.hw / stride
    cell = jnp.floor(nyx)
    cy = jnp.clip(cell[:, 0].astype(jnp.int32), 0, h - 1)
    cx = jnp.clip(cell[:, 1].astype(jnp.int32), 0, w - 1)
    num_g = jnp.maximum(g.count.astype(jnp.float32), 1e-8)

    # --- keypoint focal loss ---
    sigma = _gaussian_sigma(nhw[:, 0], nhw[:, 1], g.valid)
    if os.environ.get("TPUDET_SSD_CONF_LAYOUT", "ca") == "ca":
        # [C, P=h*w] layout: classes on sublanes, every cell on lanes, instead
        # of [h, w, C=20] whose minor class axis pads to 128 lanes (6.4x HBM
        # waste across the ~6 focal-block materializations, fwd and bwd); the
        # gaussian planes ride [G, P] (full lanes vs w=96 -> 128). Same math
        # as the [h, w, C] branch below; see BASELINE.md round-4 perf note.
        p = h * w
        yy = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)  # [P]
        xx = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)    # [P]
        d2 = ((nyx[:, 0][:, None] - yy[None, :]) ** 2
              + (nyx[:, 1][:, None] - xx[None, :]) ** 2)      # [G, P]
        gauss = jnp.exp(-d2 / (2.0 * sigma ** 2))  # sigma is the global-min scalar
        gauss = jnp.where(g.valid[:, None], gauss, 0.0)
        reduction = jnp.stack([
            jnp.max(jnp.where(jnp.logical_and(g.label == ci, g.valid)[:, None],
                              gauss, 0.0), axis=0)
            for ci in range(num_classes)
        ], axis=0)                                            # [C, P]
        gt_keyp = jnp.zeros((num_classes, p)).at[g.label, cy * w + cx].max(
            g.valid.astype(jnp.float32))
        kp = keypoints.reshape(p, num_classes).T              # [C, P]
        s = jax.nn.sigmoid(kp)
        log_s = jax.nn.log_sigmoid(kp)
        log_1ms = -kp + log_s  # log(1 - sigmoid(k))
        pos = -jnp.square(1.0 - s) * log_s * gt_keyp
        neg = (-jnp.power(1.0 - reduction, 4.0) * jnp.square(s) * log_1ms
               * (1.0 - gt_keyp))
        keyp_loss = (jnp.sum(pos) + jnp.sum(neg)) / num_g
    else:
        yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        d2 = (nyx[:, 0][:, None, None] - yy) ** 2 + (nyx[:, 1][:, None, None] - xx) ** 2
        gauss = jnp.exp(-d2 / (2.0 * sigma ** 2))          # [G, h, w]
        gauss = jnp.where(g.valid[:, None, None], gauss, 0.0)

        # reduction [h,w,C] = per-class max of gaussians (class loop avoids a
        # [G,h,w,C] temporary that would dominate HBM at batch scale)
        reduction = jnp.stack([
            jnp.max(jnp.where(jnp.logical_and(g.label == ci, g.valid)[:, None, None],
                              gauss, 0.0), axis=0)
            for ci in range(num_classes)
        ], axis=-1)
        gt_keyp = jnp.zeros((h, w, num_classes)).at[cy, cx, g.label].max(
            g.valid.astype(jnp.float32))

        s = jax.nn.sigmoid(keypoints)
        log_s = jax.nn.log_sigmoid(keypoints)
        log_1ms = -keypoints + log_s  # log(1 - sigmoid(k))
        pos = -jnp.square(1.0 - s) * log_s * gt_keyp
        neg = -jnp.power(1.0 - reduction, 4.0) * jnp.square(s) * log_1ms * (1.0 - gt_keyp)
        keyp_loss = (jnp.sum(pos) + jnp.sum(neg)) / num_g

    # --- offset / size L1 at center cells (means over [n, 2]) ---
    offset_gt = nyx - cell
    size_gt = nhw
    off_p = offset[cy, cx]
    size_p = size[cy, cx]
    vf = g.valid[:, None].astype(jnp.float32)
    denom = 2.0 * num_g
    offset_loss = jnp.sum(jnp.abs(offset_gt - off_p) * vf) / denom
    size_loss = jnp.sum(jnp.abs(size_gt - size_p) * vf) / denom
    return keyp_loss + 0.1 * size_loss + offset_loss


def centernet_loss(keypoints, offset, size, gt, num_classes, stride=4.0,
                   sample_weight=None):
    per_image = jax.vmap(
        lambda k, o, s, g: centernet_image_loss(k, o, s, g, num_classes, stride)
    )(keypoints, offset, size, gt)
    from tpudet.ops import losses as loss_ops
    return loss_ops.weighted_mean(per_image, sample_weight)


def centernet_decode(keypoints, offset, size, score_threshold, top_k, stride=4.0):
    """Single image decode: peak NMS + top-k (no box NMS).

    Returns (scores [K], boxes [K,4], class_id [K], valid [K])."""
    h, w, c = keypoints.shape
    s = jax.nn.sigmoid(keypoints)
    category = jnp.argmax(s, axis=-1)                   # [h, w]
    best = jnp.max(s, axis=-1)                          # value at argmax class
    peak = max_pool_same(best[None, :, :, None], 3, 1)[0, :, :, 0]
    scores = jnp.where(best == peak, best, 0.0).reshape(-1)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    centers = jnp.stack([yy, xx], -1).reshape(-1, 2)
    byx = centers + offset.reshape(-1, 2)
    bhw = size.reshape(-1, 2)
    boxes = jnp.concatenate([byx - bhw / 2.0, byx + bhw / 2.0], -1) * stride
    k = min(top_k, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    valid = top_scores > score_threshold
    return (top_scores, boxes[top_idx], category.reshape(-1)[top_idx].astype(jnp.int32),
            valid)
