"""Batched anchor-assignment as a single Pallas TPU kernel.

The anchor-family losses (SSD300.py:345-453, RetinaNet.py:380-474,
RefineDet.py:420-520) need, per image, four products of the [G, A] IoU matrix:

  * ``best_anchor`` [G]  — argmax_a IoU (ties -> lowest anchor index),
  * ``best_iou``    [A]  — max_g IoU over valid gt rows (invalid rows = -1),
  * ``rg``          [A]  — argmax_g of the same (ties -> lowest gt index),
  * ``best_set``    [A]  — anchors claimed as some valid gt's best anchor.

The XLA formulation (tpudet.ops.matching, vmapped over the batch) materializes
a dozen [B, G, A] intermediates in HBM — measured 7.3 GB of traffic / 12.4 ms
for SSD300 at B=32, A=8828 (scripts/profile_ssd2.py, .convergence/queue7.log),
pure bandwidth with ~zero FLOPs. Here the whole per-image assignment runs in
one grid program with everything VMEM-resident: anchors are four [r, 128]
coordinate planes (~140 KB), ground truth streams through in 8-row sublane
chunks so no [G, A] temporary ever exceeds [8, r, 128] (~290 KB at A=8828),
and only the four [A]- / [G]-sized products ever touch HBM.

All four products are integer/boolean decisions (no gradient flows through
them — the gt and anchor inputs carry no parameter dependence), so no custom
VJP is needed; the differentiable CE / smooth-L1 arithmetic stays in XLA.

Semantics are bit-identical to matching.{best_anchor_per_gt, best_gt_per_anchor,
scatter_best_mask} on the masked IoU matrix (tie-breaking included); asserted
against them in tests/test_assign_kernel.py and covered transitively by the
loss-scalar parity tests vs the running reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_IDX = 2 ** 30
_G_CHUNK = 8  # gt rows per sublane chunk (f32 min tile height)


def _kernel(gy1_ref, gx1_ref, gy2_ref, gx2_ref, gval_ref,
            ay1_ref, ax1_ref, ay2_ref, ax2_ref,
            ba_ref, bi_ref, rg_ref, bs_ref,
            run_iou, run_rg, run_bs, *, g_pad: int):
    """One grid program = one image. gt planes are [G_pad, 128] lane-broadcast;
    anchor planes [r, 128]; outputs ba [G_pad, 128] (lane-broadcast), and
    bi/rg/bs [r, 128]."""
    ay1 = ay1_ref[0]
    ax1 = ax1_ref[0]
    ay2 = ay2_ref[0]
    ax2 = ax2_ref[0]
    r, lanes = ay1.shape
    a_area = (ay2 - ay1) * (ax2 - ax1)
    lin_a = (jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 0) * lanes
             + jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1))

    run_iou[...] = jnp.full((r, lanes), -1.0, jnp.float32)
    run_rg[...] = jnp.zeros((r, lanes), jnp.int32)
    run_bs[...] = jnp.zeros((r, lanes), jnp.int32)

    n_chunks = g_pad // _G_CHUNK

    def chunk(c, _):
        s = c * _G_CHUNK
        # [_G_CHUNK, 1] per-gt scalars (lane 0 of the broadcast planes)
        gy1 = gy1_ref[0, pl.dslice(s, _G_CHUNK), 0:1]
        gx1 = gx1_ref[0, pl.dslice(s, _G_CHUNK), 0:1]
        gy2 = gy2_ref[0, pl.dslice(s, _G_CHUNK), 0:1]
        gx2 = gx2_ref[0, pl.dslice(s, _G_CHUNK), 0:1]
        gval = gval_ref[0, pl.dslice(s, _G_CHUNK), 0:1] > 0.5

        g3 = lambda t: t[:, :, None]                     # [gc, 1, 1]
        a3 = lambda t: t[None, :, :]                     # [1, r, lanes]
        iy = (jnp.minimum(g3(gy2), a3(ay2)) - jnp.maximum(g3(gy1), a3(ay1)))
        ix = (jnp.minimum(g3(gx2), a3(ax2)) - jnp.maximum(g3(gx1), a3(ax1)))
        inter = jnp.maximum(iy, 0.0) * jnp.maximum(ix, 0.0)
        g_area = (gy2 - gy1) * (gx2 - gx1)               # [gc, 1]
        # Clamp the union: a zero-area gt (h or w clipped to 0) against a
        # zero-area padding anchor gives 0/0 -> NaN, which would poison row_max
        # and send best_anchor to _BIG_IDX; the XLA path yields IoU 0 there.
        denom = jnp.maximum(g3(g_area) + a3(a_area) - inter, 1e-12)
        iou = inter / denom                              # [gc, r, lanes]
        # masked_iou_matrix semantics: invalid gt rows contribute 0
        iou = jnp.where(g3(gval.astype(jnp.float32)) > 0.5, iou, 0.0)

        # --- best anchor per gt (ties -> lowest anchor index) ---
        row_max = jnp.max(jnp.max(iou, axis=2, keepdims=True), axis=1,
                          keepdims=True)                  # [gc, 1, 1]
        j = jnp.min(jnp.min(
            jnp.where(iou == row_max, a3(lin_a), _BIG_IDX),
            axis=2, keepdims=True), axis=1, keepdims=True)  # [gc, 1, 1]
        ba_ref[0, pl.dslice(s, _G_CHUNK), :] = jnp.broadcast_to(
            j[:, :, 0], (_G_CHUNK, lanes)).astype(jnp.int32)

        # --- best-set accumulation (valid gts only) ---
        claimed = jnp.logical_and(a3(lin_a) == j, g3(gval))  # [gc, r, lanes]
        run_bs[...] = jnp.maximum(run_bs[...],
                                  jnp.max(claimed.astype(jnp.int32), axis=0))

        # --- best gt per anchor (invalid rows -> -1; ties -> lowest g) ---
        miou = jnp.where(g3(gval), iou, -1.0)
        cmax = jnp.max(miou, axis=0)                      # [r, lanes]
        g_idx = s + jax.lax.broadcasted_iota(jnp.int32, miou.shape, 0)
        carg = jnp.min(jnp.where(miou == cmax, g_idx, _BIG_IDX), axis=0)
        better = cmax > run_iou[...]   # strict: earlier chunks win ties
        run_rg[...] = jnp.where(better, carg, run_rg[...])
        run_iou[...] = jnp.where(better, cmax, run_iou[...])
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)
    bi_ref[0, :, :] = run_iou[...]
    rg_ref[0, :, :] = run_rg[...]
    bs_ref[0, :, :] = run_bs[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def assign_anchors_pallas(gt_y1x1, gt_y2x2, gt_valid, a_y1x1, a_y2x2,
                          interpret: bool = False):
    """Batched anchor assignment, everything VMEM-resident.

    Args:
      gt_y1x1, gt_y2x2: [B, G, 2] gt corners (padded rows arbitrary).
      gt_valid: [B, G] bool.
      a_y1x1, a_y2x2: [A, 2] shared anchors, or [B, A, 2] per-image boxes
        (the RefineDet second-stage refined anchors).

    Returns:
      best_anchor [B, G] int32, best_iou [B, A] f32, rg [B, A] int32,
      best_set [B, A] bool — matching the vmapped XLA formulation bit-for-bit.
    """
    b, g = gt_valid.shape
    g_pad = -(-g // _G_CHUNK) * _G_CHUNK
    shared = a_y1x1.ndim == 2
    a = a_y1x1.shape[-2]
    r = -(-a // 128)
    a_pad = r * 128

    def gt_plane(v):  # [B, g] -> [B, g_pad, 128] lane-broadcast
        v = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, g_pad - g)))
        return jnp.broadcast_to(v[:, :, None], (b, g_pad, 128))

    planes_gt = [gt_plane(gt_y1x1[..., 0]), gt_plane(gt_y1x1[..., 1]),
                 gt_plane(gt_y2x2[..., 0]), gt_plane(gt_y2x2[..., 1]),
                 gt_plane(gt_valid)]

    def anc_plane(v):  # [..., A] -> [(B,) r, 128]; pad with far-away boxes
        v = jnp.pad(v.astype(jnp.float32), ((0, 0),) * (v.ndim - 1)
                    + ((0, a_pad - a),), constant_values=-1e8)
        return v.reshape(v.shape[:-1] + (r, 128))

    if shared:
        planes_a = [anc_plane(a_y1x1[:, 0][None]), anc_plane(a_y1x1[:, 1][None]),
                    anc_plane(a_y2x2[:, 0][None]), anc_plane(a_y2x2[:, 1][None])]
        a_spec = pl.BlockSpec((1, r, 128), lambda i: (0, 0, 0))
    else:
        planes_a = [anc_plane(a_y1x1[..., 0]), anc_plane(a_y1x1[..., 1]),
                    anc_plane(a_y2x2[..., 0]), anc_plane(a_y2x2[..., 1])]
        a_spec = pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0))

    kernel = functools.partial(_kernel, g_pad=g_pad)
    ba, bi, rg, bs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, g_pad, 128), lambda i: (i, 0, 0))] * 5
                 + [a_spec] * 4,
        out_specs=[pl.BlockSpec((1, g_pad, 128), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, g_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((b, r, 128), jnp.float32),
                   jax.ShapeDtypeStruct((b, r, 128), jnp.int32),
                   jax.ShapeDtypeStruct((b, r, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32),
                        pltpu.VMEM((r, 128), jnp.int32),
                        pltpu.VMEM((r, 128), jnp.int32)],
        interpret=interpret,
    )(*planes_gt, *planes_a)

    best_anchor = ba[:, :g, 0]
    best_iou = bi.reshape(b, a_pad)[:, :a]
    rg_out = rg.reshape(b, a_pad)[:, :a]
    best_set = bs.reshape(b, a_pad)[:, :a] > 0
    return best_anchor, best_iou, rg_out, best_set
