"""Loss primitives shared by the detection heads.

Formulas are transcriptions of the reference semantics (SURVEY.md §2.4):
  * smooth L1               — SSD300.py:455-456
  * sparse softmax CE       — tf.losses.sparse_softmax_cross_entropy equivalents
  * sigmoid CE              — tf.nn.sigmoid_cross_entropy_with_logits equivalent
  * softmax focal           — RetinaNet.py:457-474 (applied to pos AND neg)
  * penalty-reduced focal   — CenterNet.py:248-250
  * IoU (-log) loss         — FCOS.py:315-320

All are elementwise / rowwise pure functions; reductions belong to the callers so each
head can reproduce its reference's exact normalization.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """``0.5 x^2`` for ``|x| < 1`` else ``|x| - 0.5`` (SSD300.py:455-456)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sparse softmax CE per row. ``logits [..., C]``, ``labels [...] int``."""
    logz = _logsumexp(logits)
    picked = jnp.take_along_axis(logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return logz - picked


def _logsumexp(logits: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(logits, axis=-1)
    return m + jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))


def log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    """Stable log-softmax; compute once and gather when several CE targets share the
    same logits (the anchor losses query background + assigned labels per anchor)."""
    return logits - _logsumexp(logits)[..., None]


def ce_from_log_probs(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return -jnp.take_along_axis(
        log_probs, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]


def sigmoid_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid CE (tf.nn.sigmoid_cross_entropy_with_logits)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def softmax_focal(
    logits: jnp.ndarray, labels: jnp.ndarray, alpha: float, gamma: float
) -> jnp.ndarray:
    """RetinaNet's softmax-form focal loss: ``-alpha * (1-p)^gamma * log(p)`` where
    ``p`` is the softmax probability of the true class (RetinaNet.py:457-474 applies
    this same form to positives and background rows alike)."""
    ce = softmax_cross_entropy(logits, labels)
    p = jnp.exp(-ce)
    return alpha * jnp.power(1.0 - p, gamma) * ce


def penalty_reduced_focal(
    sigmoid_hm: jnp.ndarray, gaussian_gt: jnp.ndarray, pos_mask: jnp.ndarray,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """CenterNet keypoint focal loss per location (CenterNet.py:248-250).

    pos: ``-(1 - s)^2 log(s)``;  neg: ``-(1 - g)^4 s^2 log(1 - s)``.
    ``pos_mask`` marks gaussian-peak cells; caller divides by num_gt.
    """
    s = sigmoid_hm
    pos = -jnp.square(1.0 - s) * jnp.log(s + eps)
    neg = -jnp.power(1.0 - gaussian_gt, 4.0) * jnp.square(s) * jnp.log(1.0 - s + eps)
    return jnp.where(pos_mask, pos, neg)


def neg_log_iou(
    p_tlbr: jnp.ndarray, g_tlbr: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """FCOS regression loss ``-log(IoU)`` between predicted and target
    (top, left, bottom, right) distances at the same location (FCOS.py:315-320)."""
    pt, pl, pb, pr = (p_tlbr[..., i] for i in range(4))
    gt_, gl, gb, gr = (g_tlbr[..., i] for i in range(4))
    p_area = (pt + pb) * (pl + pr)
    g_area = (gt_ + gb) * (gl + gr)
    inter_h = jnp.minimum(pt, gt_) + jnp.minimum(pb, gb)
    inter_w = jnp.minimum(pl, gl) + jnp.minimum(pr, gr)
    inter = inter_h * inter_w
    iou = inter / (p_area + g_area - inter + eps)
    return -jnp.log(iou + eps)


def weighted_mean(per_sample: jnp.ndarray, sample_weight=None) -> jnp.ndarray:
    """Mean over the REAL samples of a (possibly padded) batch.

    ``sample_weight`` is 1.0 for real rows and 0.0 for padding rows appended so the
    batch divides the device mesh (runtime/mesh.py pad_to_mesh); with no padding it
    is None and this is a plain mean, matching the reference's per-batch loss mean
    (e.g. SSD300.py:148).
    """
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = sample_weight.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
