"""RoI feature extraction: tf.image.crop_and_resize equivalent (LH_RCNN.py:146-166).

Semantics matched to TF's kernel: boxes are (y1, x1, y2, x2) in NORMALIZED image
coordinates; for crop size S > 1 the sample grid is
``y_i = y1*(H-1) + i * (y2-y1)*(H-1) / (S-1)`` with bilinear interpolation and
out-of-range samples filled with 0 (extrapolation_value). Fully batched/jittable —
the gather patterns map onto XLA's dynamic-gather on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def crop_and_resize(feat: jnp.ndarray, boxes: jnp.ndarray, size: int) -> jnp.ndarray:
    """feat [H, W, C]; boxes [N, 4] normalized (y1,x1,y2,x2) -> [N, size, size, C]."""
    h, w, _ = feat.shape
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    steps = jnp.arange(size, dtype=jnp.float32) / max(size - 1, 1)
    ys = (y1[:, None] + steps[None, :] * (y2 - y1)[:, None]) * (h - 1)  # [N, S]
    xs = (x1[:, None] + steps[None, :] * (x2 - x1)[:, None]) * (w - 1)

    def sample_axis(coords, limit):
        # TF zeroes the WHOLE sample when the point leaves [0, limit-1]
        in_range = (coords >= 0.0) & (coords <= limit - 1)
        c0 = jnp.floor(coords)
        frac = coords - c0
        c0i = jnp.clip(c0.astype(jnp.int32), 0, limit - 1)
        c1i = jnp.clip(c0i + 1, 0, limit - 1)
        return c0i, c1i, frac, in_range

    y0, y1i, fy, vy = sample_axis(ys, h)
    x0, x1i, fx, vx = sample_axis(xs, w)

    def gather(yi, xi):
        # yi [N,S], xi [N,S] -> [N,S,S,C]
        return feat[yi[:, :, None], xi[:, None, :]]

    top = (gather(y0, x0) * (1 - fx)[:, None, :, None]
           + gather(y0, x1i) * fx[:, None, :, None])
    bot = (gather(y1i, x0) * (1 - fx)[:, None, :, None]
           + gather(y1i, x1i) * fx[:, None, :, None])
    out = top * (1 - fy)[:, :, None, None] + bot * fy[:, :, None, None]
    valid = (vy[:, :, None] & vx[:, None, :]).astype(out.dtype)
    return out * valid[..., None]
