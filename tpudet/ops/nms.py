"""Fixed-shape greedy non-max suppression for TPU.

The reference calls TF's C++ ``tf.image.non_max_suppression`` kernel sequentially per
class on the host graph (SSD300.py:172-188 — a pattern repeated in 8 of the 10 models)
and also uses NMS-on-loss for hard-negative mining (SSD300.py:430-434, SURVEY.md Q15).

Here NMS is a static-shape XLA program: an iterative argmax-select / suppress loop
(`lax.fori_loop`), vmappable over classes and batch so the whole decode runs as ONE
device program instead of 20 sequential host-driven kernels. Semantics match TF:
boxes are taken in descending score order (ties -> lowest index, like TF's stable sort)
and a box is suppressed when its IoU with an already-selected box exceeds
``iou_threshold`` (strictly greater).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from tpudet.ops import boxes as box_ops

_NEG = -1e30


def greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    iou_threshold: float,
    active: jnp.ndarray | None = None,
    num_select: jnp.ndarray | None = None,
):
    """Greedy NMS with static output shape.

    Args:
      boxes: ``[N, 4]`` corner boxes (y1, x1, y2, x2).
      scores: ``[N]`` selection scores (any real values).
      max_out: static upper bound on selections (loop trip count).
      iou_threshold: suppress boxes with IoU strictly greater than this.
      active: optional ``[N]`` bool — candidates; inactive boxes are never selected.
      num_select: optional dynamic scalar — stop after this many selections (the
        reference's ``chosen_num_neg`` in hard-negative mining is data dependent).

    Returns:
      ``(indices [max_out] int32, valid [max_out] bool)`` — selected box indices in
      selection order, padded; ``valid`` marks real selections.
    """
    n = boxes.shape[0]
    scores = jnp.where(active, scores, _NEG) if active is not None else scores
    scores = scores.astype(jnp.float32)

    def body(i, state):
        avail_scores, sel_idx, sel_valid = state
        j = jnp.argmax(avail_scores)
        ok = avail_scores[j] > _NEG / 2
        if num_select is not None:
            ok = jnp.logical_and(ok, i < num_select)
        iou = box_ops.iou_corner(boxes[j][None, :], boxes)
        suppress = jnp.logical_and(ok, iou > iou_threshold)
        suppress = suppress.at[j].set(ok)
        avail_scores = jnp.where(suppress, _NEG, avail_scores)
        # invalid slots store 0, matching the Pallas kernels (callers mask by
        # ``valid``; identical filler keeps the paths bit-comparable)
        sel_idx = sel_idx.at[i].set(jnp.where(ok, j.astype(jnp.int32), 0))
        sel_valid = sel_valid.at[i].set(ok)
        return avail_scores, sel_idx, sel_valid

    init = (
        scores,
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), bool),
    )
    _, sel_idx, sel_valid = jax.lax.fori_loop(0, max_out, body, init)
    del n
    return sel_idx, sel_valid


def batched_greedy_nms(boxes, scores, num_select, max_out: int,
                       iou_threshold: float, active=None):
    """Batch-of-images greedy NMS with a shared or per-image box set.

    On TPU this runs as ONE Pallas kernel (grid over batch, scores resident in VMEM
    for the whole select/suppress loop — tpudet.ops.pallas.nms_kernel); elsewhere it
    falls back to the vmapped XLA loop. Semantics identical to :func:`greedy_nms`.

    Args:
      boxes: ``[N, 4]`` (shared) or ``[B, N, 4]`` corner boxes.
      scores: ``[B, N]``.
      num_select: ``[B]`` dynamic per-image selection budgets.
      active: optional ``[B, N]`` bool candidate mask.

    Returns ``(sel_idx [B, max_out] int32, valid [B, max_out] bool)``.
    """
    if active is not None:
        scores = jnp.where(active, scores, _NEG)
    # selection is index-only: no gradient flows through NMS (the caller gathers
    # differentiable values with the returned indices)
    boxes = jax.lax.stop_gradient(boxes)
    scores = jax.lax.stop_gradient(scores)
    num_select = jax.lax.stop_gradient(num_select)

    def _pallas(bx, s, ns):
        from tpudet.ops.pallas.nms_kernel import batched_greedy_nms_pretopk

        return batched_greedy_nms_pretopk(bx, s, ns, max_out, iou_threshold)

    def _xla(bx, s, ns):
        if bx.ndim == 2:
            return jax.vmap(
                lambda s_, ns_: greedy_nms(bx, s_, max_out, iou_threshold,
                                           num_select=ns_)
            )(s, ns)
        return jax.vmap(
            lambda b_, s_, ns_: greedy_nms(b_, s_, max_out, iou_threshold,
                                           num_select=ns_)
        )(bx, s, ns)

    # dispatch at LOWERING time, not trace time: a computation lowered for an
    # explicit non-default backend (jit(..., backend='cpu'), or CPU tests on a TPU
    # host) gets the right implementation either way. TPUDET_NMS_IMPL=xla|pallas
    # overrides (escape hatch while a kernel regression is being isolated).
    forced = os.environ.get("TPUDET_NMS_IMPL", "").lower()
    if forced == "xla":
        return _xla(boxes, scores, num_select)
    if forced == "pallas":
        return _pallas(boxes, scores, num_select)
    return jax.lax.platform_dependent(boxes, scores, num_select,
                                      tpu=_pallas, default=_xla)


def topk_then_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    active: jnp.ndarray,
    pre_topk: int,
    max_out: int,
    iou_threshold: float,
):
    """Score-filtered NMS: keep the top ``pre_topk`` active candidates, then NMS.

    Mirrors the reference inference pattern ``boolean_mask(score >= thr)`` followed by
    per-class NMS (SSD300.py:172-188) in fixed shape. Because greedy NMS only ever
    selects in descending score order, restricting to the top ``pre_topk`` candidates
    is exact as long as at most ``pre_topk`` candidates pass the score filter; the
    returned ``truncated`` flag tells the caller when that bound was exceeded so it
    can re-run with a larger ``pre_topk`` (DetectorBase.test_one_image does).

    Returns ``(sel_boxes [max_out,4], sel_scores [max_out], valid [max_out],
    truncated bool scalar)``.
    """
    full = scores.shape[-1]
    eff_topk = min(pre_topk, full)
    truncated = (jnp.sum(active) > eff_topk) if eff_topk < full else jnp.asarray(False)
    masked = jnp.where(active, scores, _NEG).astype(jnp.float32)
    top_scores, top_idx = jax.lax.top_k(masked, eff_topk)
    top_boxes = boxes[top_idx]
    sel, valid = greedy_nms(
        top_boxes, top_scores, max_out, iou_threshold,
        active=top_scores > _NEG / 2,
    )
    return top_boxes[sel], top_scores[sel], valid, truncated


def per_class_nms(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    score_threshold: float,
    pre_topk: int,
    max_out: int,
    iou_threshold: float,
    class_active: jnp.ndarray | None = None,
):
    """Class-parallel NMS over a shared box set.

    Args:
      boxes: ``[N, 4]`` decoded corner boxes (shared across classes).
      class_scores: ``[C, N]`` per-class scores.
      score_threshold: candidates must have ``score >= score_threshold``.
      class_active: optional ``[N]`` bool applied to every class (e.g. the reference's
        "argmax is not background" pre-filter, SSD300.py:160-162).

    Returns:
      ``(boxes [C, max_out, 4], scores [C, max_out], valid [C, max_out],
      truncated bool scalar — True if any class had more candidates above the
      score threshold than ``pre_topk``, i.e. the result may not be exact)``.

    On TPU the classes ride the cross-batch Pallas kernel as its batch axis
    (ops/pallas/nms_kernel.py): every greedy iteration selects one box PER
    CLASS in lockstep with the candidate pool resident in VMEM, replacing the
    vmapped per-class ``fori_loop`` whose sequential small-op iterations
    dominated single-image decode latency (round-4 BENCH_DETAILS: 218-278 ms
    p50 on YOLOv3/RetinaNet/FCOS/LHRCNN). The kernel's pre-top-k pool carries
    its own exact fallback, so this path never truncates (``truncated`` is
    constant False) and the caller's retry loop is a no-op. ``TPUDET_PCNMS_IMPL=
    vmap|batched`` overrides the platform dispatch.
    """
    active = class_scores >= score_threshold
    if class_active is not None:
        active = jnp.logical_and(active, class_active[None, :])

    def _vmap(boxes, class_scores, active):
        fn = partial(topk_then_nms, pre_topk=pre_topk, max_out=max_out,
                     iou_threshold=iou_threshold)
        b, s, v, trunc = jax.vmap(lambda s_, a: fn(boxes, s_, a))(class_scores,
                                                                  active)
        return b, s, v, jnp.any(trunc)

    def _batched(boxes, class_scores, active):
        c = class_scores.shape[0]
        masked = jnp.where(active, class_scores, _NEG).astype(jnp.float32)
        quota = jnp.full((c,), max_out, jnp.int32)
        sel, valid = batched_greedy_nms(boxes, masked, quota, max_out,
                                        iou_threshold)
        sel_boxes = boxes[sel] if boxes.ndim == 2 else \
            jnp.take_along_axis(boxes, sel[..., None], 1)
        sel_scores = jnp.take_along_axis(masked, sel, 1)
        return sel_boxes, sel_scores, valid, jnp.asarray(False)

    forced = os.environ.get("TPUDET_PCNMS_IMPL", "").lower()
    if forced == "vmap":
        return _vmap(boxes, class_scores, active)
    if forced == "batched":
        return _batched(boxes, class_scores, active)
    return jax.lax.platform_dependent(boxes, class_scores, active,
                                      tpu=_batched, default=_vmap)
