"""Box geometry ops: format conversion, pairwise IoU, anchor box coding.

All boxes use the reference's conventions (see SURVEY.md §2.4):
  * center form   ``yx``/``hw``: ``[y_center, x_center]`` and ``[height, width]``
  * corner form   ``y1x1``/``y2x2``: top-left / bottom-right corners
  * pixel units of the network input image.

The IoU formula matches /root/reference/SSD300.py:356-376 (intersection via
``max(min(y2x2) - max(y1x1), 0)`` product, union ``a + g - inter``, no epsilon);
box coding matches SSD300.py:167-170 and 446-447:
  encode: ``t_yx = (g_yx - a_yx) / a_hw``, ``t_hw = log(g_hw / a_hw)``
  decode: ``b_yx = p_yx * a_hw + a_yx``, ``b_hw = a_hw * exp(p_hw)``
"""

from __future__ import annotations

import jax.numpy as jnp


def center_to_corners(yx: jnp.ndarray, hw: jnp.ndarray):
    """``(yx, hw) -> (y1x1, y2x2)``. Shapes ``[..., 2]``."""
    half = hw / 2.0
    return yx - half, yx + half


def corners_to_center(y1x1: jnp.ndarray, y2x2: jnp.ndarray):
    """``(y1x1, y2x2) -> (yx, hw)``. Shapes ``[..., 2]``."""
    return (y1x1 + y2x2) / 2.0, y2x2 - y1x1


def area(hw: jnp.ndarray) -> jnp.ndarray:
    """Box area from ``[..., 2]`` height/width."""
    return jnp.prod(hw, axis=-1)


def pairwise_iou(
    g_y1x1: jnp.ndarray,
    g_y2x2: jnp.ndarray,
    a_y1x1: jnp.ndarray,
    a_y2x2: jnp.ndarray,
    eps: float = 0.0,
) -> jnp.ndarray:
    """Pairwise IoU between two box sets in corner form.

    Args:
      g_y1x1, g_y2x2: ``[G, 2]`` ground-truth corners.
      a_y1x1, a_y2x2: ``[A, 2]`` anchor corners.
      eps: added to the union denominator (0 matches the reference formula).

    Returns:
      ``[G, A]`` IoU matrix (float32).
    """
    inter_y1x1 = jnp.maximum(g_y1x1[:, None, :], a_y1x1[None, :, :])
    inter_y2x2 = jnp.minimum(g_y2x2[:, None, :], a_y2x2[None, :, :])
    inter = jnp.prod(jnp.maximum(inter_y2x2 - inter_y1x1, 0.0), axis=-1)
    g_area = jnp.prod(g_y2x2 - g_y1x1, axis=-1)[:, None]
    a_area = jnp.prod(a_y2x2 - a_y1x1, axis=-1)[None, :]
    return inter / (g_area + a_area - inter + eps)


def iou_corner(b1: jnp.ndarray, b2: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Elementwise IoU of `[..., 4]` (y1,x1,y2,x2) boxes (broadcasting)."""
    inter_y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    inter_x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    inter_y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    inter_x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(inter_y2 - inter_y1, 0.0) * jnp.maximum(inter_x2 - inter_x1, 0.0)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter + eps)


def encode(g_yx, g_hw, a_yx, a_hw):
    """Anchor-relative box target (SSD/RetinaNet/RefineDet family)."""
    t_yx = (g_yx - a_yx) / a_hw
    t_hw = jnp.log(g_hw / a_hw)
    return t_yx, t_hw


def decode(p_yx, p_hw, a_yx, a_hw):
    """Inverse of :func:`encode`: prediction + anchor -> box center form."""
    b_yx = p_yx * a_hw + a_yx
    b_hw = a_hw * jnp.exp(p_hw)
    return b_yx, b_hw


def clip_corners(y1x1: jnp.ndarray, y2x2: jnp.ndarray, height: float, width: float):
    """Clip corner boxes to ``[0, h-1] x [0, w-1]`` (reference clip convention)."""
    lim = jnp.array([height - 1.0, width - 1.0], jnp.float32)
    return (
        jnp.clip(y1x1, 0.0, lim),
        jnp.clip(y2x2, 0.0, lim),
    )
