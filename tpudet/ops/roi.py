"""RoI feature extraction: tf.image.crop_and_resize equivalent (LH_RCNN.py:146-166).

Semantics matched to TF's kernel: boxes are (y1, x1, y2, x2) in NORMALIZED image
coordinates; for crop size S > 1 the sample grid is
``y_i = y1*(H-1) + i * (y2-y1)*(H-1) / (S-1)`` with bilinear interpolation and
out-of-range samples filled with 0 (extrapolation_value).

Two interchangeable implementations (``TPUDET_ROI_IMPL=gather|mm`` overrides the
platform dispatch):

* ``gather`` — 4 corner gathers + lerp. Fine on CPU; on TPU the
  [N*S*S*4] two-axis advanced-index gather pattern scalarizes into row DMAs and
  dominated the LH-RCNN step (round-4 BENCH: 8.1% MFU; round-5 phase profile:
  the RoI+RCNN block was 25.7 of a 35.4 ms forward).
* ``mm`` (TPU default) — bilinear interpolation as TWO einsum contractions
  against one/two-hot interpolation matrices: ``out[n,i,j,c] =
  sum_h Wy[n,i,h] * (sum_w Wx[n,j,w] * feat[h,w,c])``. Exactly the same math
  (each Wy/Wx row holds the two corner weights, zeroed when the sample leaves
  the frame — border clipping folds the two corners onto one row), but it runs
  on the MXU with zero gathers. f32 HIGHEST precision keeps it bit-comparable
  to the gather form (sums over <=2 nonzero terms per row).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _sample_axis(coords, limit):
    # TF zeroes the WHOLE sample when the point leaves [0, limit-1]
    in_range = (coords >= 0.0) & (coords <= limit - 1)
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = jnp.clip(c0.astype(jnp.int32), 0, limit - 1)
    c1i = jnp.clip(c0i + 1, 0, limit - 1)
    return c0i, c1i, frac, in_range


def _grid(feat, boxes, size):
    h, w, _ = feat.shape
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    steps = jnp.arange(size, dtype=jnp.float32) / max(size - 1, 1)
    ys = (y1[:, None] + steps[None, :] * (y2 - y1)[:, None]) * (h - 1)  # [N, S]
    xs = (x1[:, None] + steps[None, :] * (x2 - x1)[:, None]) * (w - 1)
    return ys, xs


def _crop_gather(feat, boxes, size):
    h, w, _ = feat.shape
    ys, xs = _grid(feat, boxes, size)
    y0, y1i, fy, vy = _sample_axis(ys, h)
    x0, x1i, fx, vx = _sample_axis(xs, w)

    def gather(yi, xi):
        # yi [N,S], xi [N,S] -> [N,S,S,C]
        return feat[yi[:, :, None], xi[:, None, :]]

    top = (gather(y0, x0) * (1 - fx)[:, None, :, None]
           + gather(y0, x1i) * fx[:, None, :, None])
    bot = (gather(y1i, x0) * (1 - fx)[:, None, :, None]
           + gather(y1i, x1i) * fx[:, None, :, None])
    out = top * (1 - fy)[:, :, None, None] + bot * fy[:, :, None, None]
    valid = (vy[:, :, None] & vx[:, None, :]).astype(out.dtype)
    out = out * valid[..., None]
    # bf16 features keep a bf16 result (matches the mm branch's dtype — the
    # platform_dependent branches must agree); f32 in, f32 out as before
    return out.astype(feat.dtype) if feat.dtype == jnp.bfloat16 else out


def _interp_matrix(c0, c1, frac, valid, limit):
    """[N, S, limit] row weights: (1-frac) at c0, frac at c1 (summed when the
    border clip folds them onto the same index), zeroed for invalid samples."""
    rng = jnp.arange(limit, dtype=jnp.int32)[None, None, :]
    wm = ((rng == c0[:, :, None]).astype(jnp.float32) * (1.0 - frac)[:, :, None]
          + (rng == c1[:, :, None]).astype(jnp.float32) * frac[:, :, None])
    return wm * valid[:, :, None].astype(jnp.float32)


def _crop_mm(feat, boxes, size):
    h, w, _ = feat.shape
    ys, xs = _grid(feat.astype(jnp.float32), boxes, size)
    y0, y1i, fy, vy = _sample_axis(ys, h)
    x0, x1i, fx, vx = _sample_axis(xs, w)
    wy = _interp_matrix(y0, y1i, fy, vy, h)            # [N, S, H]
    wx = _interp_matrix(x0, x1i, fx, vx, w)            # [N, S, W]
    if feat.dtype == jnp.bfloat16:
        # bf16 features stay bf16 through the contraction (MXU accumulates
        # f32; the [N, S, H, C] intermediate halves — at LH-RCNN's bs32
        # reference config the f32 form was ~3.7 GB and OOM'd the chip).
        # Each output sums <=4 corner terms, so bf16 costs only the input
        # rounding the features already carry.
        t = jnp.einsum("njw,hwc->njhc", wx.astype(jnp.bfloat16), feat,
                       preferred_element_type=jnp.bfloat16)
        return jnp.einsum("nih,njhc->nijc", wy.astype(jnp.bfloat16), t,
                          preferred_element_type=jnp.bfloat16)
    hi = jax.lax.Precision.HIGHEST
    feat = feat.astype(jnp.float32)
    t = jnp.einsum("njw,hwc->njhc", wx, feat, precision=hi)   # [N, S, H, C]
    return jnp.einsum("nih,njhc->nijc", wy, t, precision=hi)  # [N, S, S, C]


def crop_and_resize(feat: jnp.ndarray, boxes: jnp.ndarray, size: int) -> jnp.ndarray:
    """feat [H, W, C]; boxes [N, 4] normalized (y1,x1,y2,x2) -> [N, size, size, C]."""
    forced = os.environ.get("TPUDET_ROI_IMPL", "").lower()
    if forced == "gather":
        return _crop_gather(feat, boxes, size)
    if forced == "mm":
        return _crop_mm(feat, boxes, size)
    return jax.lax.platform_dependent(
        feat, boxes,
        tpu=lambda f, b: _crop_mm(f, b, size),
        default=lambda f, b: _crop_gather(f, b, size))
