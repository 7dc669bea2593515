"""Fixed-shape target-assignment building blocks.

The reference does per-image dynamic assignment with ``tf.boolean_mask`` /
``tf.unique`` / ``SparseTensor`` tricks inside a ``tf.while_loop`` over the batch
(SSD300.py:345-453, RetinaNet.py:380-474). Here the same semantics are expressed as
masked dense ops over the padded ``[G=pad_truth_to, 5]`` ground truth and the full
anchor set, so every head's assignment is a pure function that ``vmap``s over the
batch and compiles once.

Ground-truth contract (SURVEY.md §2.1): ``float32 [G, 5]`` rows of
``[y_center, x_center, h, w, class_id]`` in input-image pixels, padded with -1.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpudet.ops import boxes as box_ops


def valid_gt_count(gt: jnp.ndarray) -> jnp.ndarray:
    """Number of real (non-padding) ground-truth rows.

    Replicates ``tf.argmin(ground_truth, axis=0)[0]`` (SSD300.py:347): the index of the
    smallest ``y_center`` — which is the first -1 padding row whenever padding exists
    (real centers are >= 0). The no-padding corner case (all G rows real) truncates at
    the min-y row in the reference; we instead return G, documented as a fix of that
    degenerate truncation (it only differs when an image has >= G objects).
    """
    g = gt.shape[0]
    any_pad = jnp.any(gt[:, 0] < 0.0)
    first_pad = jnp.argmin(gt[:, 0])
    return jnp.where(any_pad, first_pad, g).astype(jnp.int32)


class GtArrays(NamedTuple):
    """Unpacked padded ground truth plus validity."""

    yx: jnp.ndarray      # [G, 2]
    hw: jnp.ndarray      # [G, 2]
    y1x1: jnp.ndarray    # [G, 2]
    y2x2: jnp.ndarray    # [G, 2]
    label: jnp.ndarray   # [G] int32
    valid: jnp.ndarray   # [G] bool
    count: jnp.ndarray   # [] int32


def unpack_gt(gt: jnp.ndarray) -> GtArrays:
    """Split the padded ``[G, 5]`` gt into components with a validity mask."""
    count = valid_gt_count(gt)
    g = gt.shape[0]
    valid = jnp.arange(g, dtype=jnp.int32) < count
    yx = gt[:, 0:2]
    hw = gt[:, 2:4]
    y1x1, y2x2 = box_ops.center_to_corners(yx, hw)
    label = gt[:, 4].astype(jnp.int32)
    # Keep padded rows harmless: label 0, unit boxes far outside the image.
    label = jnp.where(valid, label, 0)
    return GtArrays(yx, hw, y1x1, y2x2, label, valid, count)


def masked_iou_matrix(g: GtArrays, a_y1x1: jnp.ndarray, a_y2x2: jnp.ndarray) -> jnp.ndarray:
    """``[G, A]`` IoU with padded-gt rows forced to 0 (they never match anything)."""
    iou = box_ops.pairwise_iou(g.y1x1, g.y2x2, a_y1x1, a_y2x2)
    return jnp.where(g.valid[:, None], iou, 0.0)


def best_anchor_per_gt(iou: jnp.ndarray) -> jnp.ndarray:
    """Index of the highest-IoU anchor for each gt row (``[G]`` int32).

    Matches ``tf.argmax(gaiou_rate, axis=1)`` (SSD300.py:378); ties break to the
    lowest anchor index like TF.
    """
    return jnp.argmax(iou, axis=1).astype(jnp.int32)


def scatter_best_mask(best_idx: jnp.ndarray, gt_valid: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """``[A]`` bool — anchors claimed as some valid gt's best anchor.

    Replaces the reference's ``tf.unique`` + sort + SparseTensor->dense trick
    (SSD300.py:385-390). Computed as a one-hot comparison plane reduced over G
    rather than a scatter: TPU lowers the [G] scatter into a serialized loop,
    while the [G, A] compare+reduce is one VPU pass of the same magnitude as the
    IoU matrix every caller has already built.
    """
    onehot = best_idx[:, None] == jnp.arange(num_anchors, dtype=best_idx.dtype)[None, :]
    hit = jnp.logical_and(onehot, gt_valid[:, None])
    return jnp.any(hit, axis=0)


def best_gt_per_anchor(iou: jnp.ndarray, gt_valid: jnp.ndarray):
    """Per-anchor ``(best_iou [A], best_gt_idx [A])`` over valid gt rows only."""
    masked = jnp.where(gt_valid[:, None], iou, -1.0)
    best_iou = jnp.max(masked, axis=0)
    best_idx = jnp.argmax(masked, axis=0).astype(jnp.int32)
    return best_iou, best_idx


def gather_gt_rows(rg: jnp.ndarray, *tables: jnp.ndarray):
    """``table[rg]`` for small per-image gt tables (``[G]`` or ``[G, k]``).

    On TPU the dynamic row gather is lowered as a one-hot matmul on the MXU
    (``[A, G] @ [G, k]``): G is tiny (the gt pad width), so the one-hot plane
    costs ~nothing and the serialized-gather lowering is avoided. Elsewhere it
    is plain indexing. The matmul runs at ``Precision.HIGHEST`` — at the default
    precision the TPU MXU truncates f32 operands to bfloat16 (8 significant
    bits), which would round pixel-scale gt coordinates (ulp 2px near 300) and
    corrupt int labels > 256. With full precision it is exact for int tables
    too (values << 2^24 round-trip through f32); asserted vs the take path on
    hardware in scripts/smoke_kernels_tpu.py. TPUDET_GT_GATHER=take|onehot
    overrides for A/B.
    """

    def _onehot(rg, *ts):
        g = ts[0].shape[0]
        oh = (rg[:, None] == jnp.arange(g, dtype=rg.dtype)).astype(jnp.float32)
        outs = []
        for t in ts:
            flat = t[:, None] if t.ndim == 1 else t
            r = jnp.matmul(oh, flat.astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
            r = r[:, 0] if t.ndim == 1 else r
            outs.append(r.astype(t.dtype))
        return tuple(outs)

    def _take(rg, *ts):
        return tuple(t[rg] for t in ts)

    forced = os.environ.get("TPUDET_GT_GATHER", "").lower()
    if forced == "take":
        return _take(rg, *tables)
    if forced == "onehot":
        return _onehot(rg, *tables)
    return jax.lax.platform_dependent(rg, *tables, tpu=_onehot, default=_take)


class Assignment(NamedTuple):
    """Batched anchor-assignment products (the four [G, A]-derived decisions)."""

    best_anchor: jnp.ndarray  # [B, G] int32 — argmax_a IoU per gt (ties -> low a)
    best_iou: jnp.ndarray     # [B, A] f32   — max_g IoU per anchor (invalid -> -1)
    rg: jnp.ndarray           # [B, A] int32 — argmax_g (ties -> low g)
    best_set: jnp.ndarray     # [B, A] bool  — claimed as some valid gt's best


def assign_batch(gt_y1x1, gt_y2x2, gt_valid, a_y1x1, a_y2x2) -> Assignment:
    """Batched anchor assignment; ONE Pallas program on TPU, vmapped XLA ops
    elsewhere (bit-identical — tests/test_assign_kernel.py).

    These decisions carry no parameter gradient (pure functions of gt and
    anchors), so on TPU the whole [B, G, A] IoU reduction stays VMEM-resident
    inside the kernel instead of materializing GBs of HBM intermediates
    (measured 7.3 GB / 12.4 ms on SSD300 B=32 — scripts/profile_ssd2.py).

    ``a_y1x1/a_y2x2`` are [A, 2] shared anchors or [B, A, 2] per-image boxes
    (the RefineDet refined-anchor second stage). TPUDET_ASSIGN_IMPL=xla|pallas
    overrides the lowering-time platform dispatch.
    """

    def _pallas(gy1, gy2, gv, ay1, ay2):
        from tpudet.ops.pallas.assign_kernel import assign_anchors_pallas

        return assign_anchors_pallas(gy1, gy2, gv, ay1, ay2)

    def _xla(gy1, gy2, gv, ay1, ay2):
        def one(gy1_, gy2_, gv_, ay1_, ay2_):
            iou = box_ops.pairwise_iou(gy1_, gy2_, ay1_, ay2_)
            iou = jnp.where(gv_[:, None], iou, 0.0)
            ba = best_anchor_per_gt(iou)
            bi, rg = best_gt_per_anchor(iou, gv_)
            bs = scatter_best_mask(ba, gv_, ay1_.shape[0])
            return ba, bi, rg, bs

        if ay1.ndim == 2:
            return jax.vmap(lambda g1, g2, v: one(g1, g2, v, ay1, ay2))(
                gy1, gy2, gv)
        return jax.vmap(one)(gy1, gy2, gv, ay1, ay2)

    args = (gt_y1x1, gt_y2x2, gt_valid, a_y1x1, a_y2x2)
    forced = os.environ.get("TPUDET_ASSIGN_IMPL", "").lower()
    if forced == "xla":
        out = _xla(*args)
    elif forced == "pallas":
        out = _pallas(*args)
    else:
        out = jax.lax.platform_dependent(*args, tpu=_pallas, default=_xla)
    return Assignment(*out)
