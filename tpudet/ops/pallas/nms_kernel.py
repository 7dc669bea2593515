"""Batched greedy NMS as a single Pallas TPU kernel.

The XLA formulation (tpudet.ops.nms.greedy_nms) runs the argmax-select/suppress loop
as a `lax.while` with per-iteration op overhead; this kernel keeps the scores and box
coordinates resident in VMEM for the whole loop, one grid program per batch element,
so the K sequential iterations are pure VPU work with no intermediate HBM traffic.

Semantics are identical to greedy_nms / tf.image.non_max_suppression: descending
score order (ties -> lowest flat index via the iota-min trick), suppress IoU strictly
greater than the threshold, stop after ``num_select`` picks. Boxes are laid out as
four [R, 128] coordinate planes (lane-aligned for the VPU) with scores padded to
-1e30; scalar extraction uses one-hot reductions (Mosaic has no dynamic_slice), and
the integer outputs live in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_BIG_IDX = 2 ** 30  # plain int: jnp constants would be captured tracers in the kernel


def _kernel(ns_ref, sc_ref, y1_ref, x1_ref, y2_ref, x2_ref, sel_ref, val_ref,
            s, *, max_out: int, iou_threshold: float):
    i = pl.program_id(0)

    # SMEM outputs must be fully initialized: the selection loop below exits early
    # (typical mining budgets select ~10-25% of the static cap)
    def init(k, _):
        sel_ref[i, k] = 0
        val_ref[i, k] = 0
        return 0

    jax.lax.fori_loop(0, max_out, init, 0)

    s[:] = sc_ref[0]
    y1 = y1_ref[0]
    x1 = x1_ref[0]
    y2 = y2_ref[0]
    x2 = x2_ref[0]
    area = (y2 - y1) * (x2 - x1)
    n_sel = jnp.minimum(ns_ref[i], max_out)
    r, lanes = s.shape
    lin = (jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0) * lanes
           + jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1))

    def cond(carry):
        k, alive = carry
        return jnp.logical_and(k < n_sel, alive)

    def body(carry):
        k, _ = carry
        vals = s[:]
        best = jnp.max(vals)
        j = jnp.min(jnp.where(vals == best, lin, _BIG_IDX))
        ok = best > _NEG / 2  # live candidates remain
        onehot = (lin == j).astype(jnp.float32)
        by1 = jnp.sum(y1 * onehot)
        bx1 = jnp.sum(x1 * onehot)
        by2 = jnp.sum(y2 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        inter = (jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
                 * jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0))
        barea = (by2 - by1) * (bx2 - bx1)
        iou = inter / (area + barea - inter)
        # suppress overlaps AND always retire the pick itself (guards NaN IoU of
        # degenerate zero-area boxes)
        kill = jnp.logical_and(ok, jnp.logical_or(iou > iou_threshold, lin == j))
        s[:] = jnp.where(kill, _NEG, vals)
        sel_ref[i, k] = jnp.where(ok, j, 0)
        val_ref[i, k] = ok.astype(jnp.int32)
        return k + 1, ok

    # early-exit greedy loop: iterations = actual selections, not the static cap
    # (the fori_loop formulation burned max_out iterations per image regardless —
    # the dominant cost of the SSD train step's loss at 384 cap, scripts/profile_ssd)
    jax.lax.while_loop(cond, body, (0, True))


def _kernel_xb(sc_ref, ns_ref, y1_ref, x1_ref, y2_ref, x2_ref, sel_ref, val_ref,
               s, *, max_out: int, iou_threshold: float):
    """Cross-batch variant: the whole [C]-image chunk advances TOGETHER — every
    while-loop iteration picks/suppresses one box PER IMAGE (vectorized over the
    chunk), so total sequential iterations are max-selections-per-image instead of
    the per-image kernel's sum over the batch (measured 4.9 ms -> sub-ms for the
    SSD mining pass, whose ~15 selections/image were pure iteration latency)."""
    s[...] = sc_ref[...]
    y1 = y1_ref[...]
    x1 = x1_ref[...]
    y2 = y2_ref[...]
    x2 = x2_ref[...]
    area = (y2 - y1) * (x2 - x1)
    c, r, lanes = s.shape
    lin = (jax.lax.broadcasted_iota(jnp.int32, (c, r, lanes), 1) * lanes
           + jax.lax.broadcasted_iota(jnp.int32, (c, r, lanes), 2))
    n_sel = jnp.minimum(ns_ref[...][:, 0:1], max_out)  # [C, 1]
    sel_ref[...] = jnp.zeros((c, max_out), jnp.int32)
    val_ref[...] = jnp.zeros((c, max_out), jnp.int32)
    # column-index plane for the one-hot output writes below (Mosaic cannot
    # prove a dynamic lane-dim store `ref[:, dslice(k, 1)]` is 128-aligned, so
    # each pick rewrites the whole [C, max_out] tile through a lane mask — a
    # few KB of VPU work per iteration)
    kio = jax.lax.broadcasted_iota(jnp.int32, (c, max_out), 1)

    def _rmin(t):
        return jnp.min(jnp.min(t, axis=2, keepdims=True), axis=1, keepdims=True)

    def _rmax(t):
        return jnp.max(jnp.max(t, axis=2, keepdims=True), axis=1, keepdims=True)

    def _rsum(t):
        return jnp.sum(jnp.sum(t, axis=2, keepdims=True), axis=1, keepdims=True)

    def cond(carry):
        k, cont = carry
        return jnp.logical_and(k < max_out, cont)

    def body(carry):
        k, _ = carry
        vals = s[...]
        best = _rmax(vals)                                        # [C,1,1]
        j = _rmin(jnp.where(vals == best, lin, _BIG_IDX))         # [C,1,1]
        active = jnp.logical_and(k < n_sel[:, :, None], best > _NEG / 2)
        onehot = (lin == j).astype(jnp.float32)
        by1 = _rsum(y1 * onehot)
        bx1 = _rsum(x1 * onehot)
        by2 = _rsum(y2 * onehot)
        bx2 = _rsum(x2 * onehot)
        inter = (jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
                 * jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0))
        barea = (by2 - by1) * (bx2 - bx1)
        iou = inter / (area + barea - inter)
        kill = jnp.logical_and(active,
                               jnp.logical_or(iou > iou_threshold, lin == j))
        s[...] = jnp.where(kill, _NEG, vals)
        ok2 = active[:, :, 0]                                     # [C,1] bool
        j2 = j[:, :, 0]
        at_k = kio == k                                           # [C, max_out]
        sel_ref[...] = jnp.where(jnp.logical_and(at_k, ok2),
                                 j2, sel_ref[...])
        val_ref[...] = jnp.where(jnp.logical_and(at_k, ok2),
                                 1, val_ref[...])
        return k + 1, jnp.any(active)

    jax.lax.while_loop(cond, body, (0, True))


@functools.partial(jax.jit, static_argnames=("max_out", "iou_threshold", "interpret"))
def batched_greedy_nms_pallas(boxes, scores, num_select, max_out: int,
                              iou_threshold: float, interpret: bool = False):
    """boxes [N, 4] (shared across batch) or [B, N, 4]; scores [B, N] with inactive
    entries pre-masked to <= -1e30; num_select [B] int32.

    Returns (sel_idx [B, max_out] int32, valid [B, max_out] bool).

    Dispatches to the cross-batch kernel (images advance in lockstep, chunked to a
    VMEM budget); set TPUDET_NMS_KERNEL=perimage for the original one-image-per-
    grid-program kernel.
    """
    import os

    if os.environ.get("TPUDET_NMS_KERNEL", "").lower() != "perimage":
        b, n = scores.shape
        r = -(-n // 128)
        n_pad = r * 128
        pad = n_pad - n
        # chunk the batch to ~8 MB of live VMEM (≈10 [C, r, 128] f32 arrays).
        # Mosaic requires a 2D block's second-minor dim to be a multiple of 8
        # OR equal to the array dim, so either the whole batch is one program
        # (block == array, unconstrained) or chunks are multiples of 8 (the
        # 8 MB budget may then be exceeded up to 8x at very wide rows — still
        # far under VMEM).
        chunk_max = int(max(1, (8 * 2 ** 20) // (10 * r * 128 * 4)))
        if b <= chunk_max:
            grid, chunk = 1, b
        else:
            chunk = max(8, (chunk_max // 8) * 8)
            grid = -(-b // chunk)
        b_pad = grid * chunk
        scores = jnp.pad(scores.astype(jnp.float32),
                         ((0, b_pad - b), (0, pad)), constant_values=_NEG)
        scores = scores.reshape(b_pad, r, 128)
        ns = jnp.pad(num_select.astype(jnp.int32), (0, b_pad - b))
        ns_bcast = jnp.broadcast_to(ns[:, None], (b_pad, 128))
        if boxes.ndim == 2:
            boxes = jnp.broadcast_to(boxes[None], (b, n, 4))
        boxes = jnp.pad(boxes.astype(jnp.float32),
                        ((0, b_pad - b), (0, pad), (0, 0)))
        planes = [boxes[:, :, i].reshape(b_pad, r, 128) for i in range(4)]
        kernel = functools.partial(_kernel_xb, max_out=max_out,
                                   iou_threshold=iou_threshold)
        sel, val = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((chunk, r, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((chunk, 128), lambda i: (i, 0))]
                     + [pl.BlockSpec((chunk, r, 128), lambda i: (i, 0, 0))] * 4,
            out_specs=[pl.BlockSpec((chunk, max_out), lambda i: (i, 0))] * 2,
            out_shape=[jax.ShapeDtypeStruct((b_pad, max_out), jnp.int32)] * 2,
            scratch_shapes=[pltpu.VMEM((chunk, r, 128), jnp.float32)],
            interpret=interpret,
        )(scores, ns_bcast, *planes)
        return sel[:b], val[:b] > 0
    return _pallas_per_image(boxes, scores, num_select, max_out, iou_threshold,
                             interpret)


@functools.partial(jax.jit, static_argnames=("max_out", "iou_threshold", "interpret"))
def batched_greedy_nms_pretopk(boxes, scores, num_select, max_out: int,
                               iou_threshold: float, interpret: bool = False):
    """Pre-top-k pool in front of the cross-batch kernel.

    Greedy NMS only ever selects in descending score order, so restricting the
    kernel to the top ``pool`` candidates per image is EXACT unless a run
    consumes its whole pool (picked + suppressed == pool) before filling its
    quota while more active candidates existed outside the pool. That rare case
    falls back to the full-width kernel for the whole batch (one ``lax.cond``).

    Payoff: the VMEM working set shrinks ~N/pool-fold, so the whole batch
    advances in ONE grid program and each select/suppress iteration moves KBs
    instead of MBs (the mining NMS was 6.1 ms of the SSD300 train step at
    N=8828 — scripts/profile_ssd2.py, .convergence/queue7.log).

    The fallback runs the XLA vmapped greedy loop at FULL width, not the
    Pallas kernel: at inference widths (e.g. RetinaNet's 57k anchors, r=448
    lane rows) the full-width kernel's VMEM working set exceeds the 16 MB
    scoped-vmem stack limit (measured 17.55M, round-5), and the fallback is
    the rare-exactness path where throughput doesn't matter.
    """
    n = scores.shape[-1]
    pool = max(2 * max_out, 512)
    if n <= pool:
        return batched_greedy_nms_pallas(boxes, scores, num_select, max_out,
                                         iou_threshold, interpret)
    scores = scores.astype(jnp.float32)
    top_s, top_i = jax.lax.top_k(scores, pool)                    # [B, pool]
    if boxes.ndim == 2:
        top_b = boxes[top_i]                                      # [B, pool, 4]
    else:
        top_b = jnp.take_along_axis(boxes, top_i[..., None], 1)
    sel_p, val = batched_greedy_nms_pallas(top_b, top_s, num_select, max_out,
                                           iou_threshold, interpret)
    n_active = jnp.sum(scores > _NEG / 2, -1)                     # [B]
    quota = jnp.minimum(jnp.minimum(num_select, max_out), n_active)
    pool_exhausted = jnp.sum(val.astype(jnp.int32), -1) < quota
    inexact = jnp.any(jnp.logical_and(pool_exhausted, n_active > pool))
    sel_g = jnp.where(val, jnp.take_along_axis(top_i, sel_p, 1), 0)

    def _full(_):
        from tpudet.ops import nms as nms_ops

        if boxes.ndim == 2:
            return jax.vmap(
                lambda s_, ns_: nms_ops.greedy_nms(boxes, s_, max_out,
                                                   iou_threshold, num_select=ns_)
            )(scores, num_select)
        return jax.vmap(
            lambda b_, s_, ns_: nms_ops.greedy_nms(b_, s_, max_out,
                                                   iou_threshold, num_select=ns_)
        )(boxes, scores, num_select)

    return jax.lax.cond(inexact, _full, lambda _: (sel_g, val), 0)


def _pallas_per_image(boxes, scores, num_select, max_out: int,
                      iou_threshold: float, interpret: bool = False):
    """Original kernel: one grid program per image (kept for A/B comparison)."""
    b, n = scores.shape
    r = -(-n // 128)
    n_pad = r * 128
    pad = n_pad - n
    scores = jnp.pad(scores.astype(jnp.float32), ((0, 0), (0, pad)),
                     constant_values=_NEG).reshape(b, r, 128)
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], (b, n, 4))
    boxes = jnp.pad(boxes.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    planes = [boxes[:, :, i].reshape(b, r, 128) for i in range(4)]

    kernel = functools.partial(_kernel, max_out=max_out,
                               iou_threshold=iou_threshold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, 128), lambda i, ns: (i, 0, 0))] * 5,
        # full-array SMEM outputs: each program writes its own row with scalar stores
        out_specs=[pl.BlockSpec((b, max_out), lambda i, ns: (0, 0),
                                memory_space=pltpu.SMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32)],
    )
    sel, val = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, max_out), jnp.int32),
                   jax.ShapeDtypeStruct((b, max_out), jnp.int32)],
        interpret=interpret,
    )(num_select.astype(jnp.int32), scores, *planes)
    return sel, val > 0
