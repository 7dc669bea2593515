"""Augmentation compiled into the jitted train step.

The reference runs flips and color jitter inside host-side ``tf.data`` threads
(utils/image_augmentor.py:147-184). On a TPU these are pure bandwidth ops that the
host CPU struggles to feed; here they run on device, fused by XLA into the step, so
the host pipeline only has to decode and resize (SURVEY.md §7.1 "geometric/color
augmentation compiled into the device step").

Semantics mirror the host augmentor (tpudet/data/augment.py:245-267) exactly, but
batched and keyed by an explicit JAX PRNG:

  * top-down / left-right flips with center-format box remap
    ``c' = (dim - 1) - c`` (the corner remap ymin,ymax = H-ymax-1, H-ymin-1 in
    center/size form);
  * brightness: add a per-image uniform [0, 0.3) delta (the reference applies
    ``tf.image.adjust_brightness`` semantics on 0-255 floats — kept as-is);
  * contrast: scale 0.8-1.2 around the per-image per-channel mean;
  * hue: shift by a uniform [-0.1, 0.1) in TF's HSV convention.

Config dict (the model config key ``device_augment``):
``{"flip_prob": [td, lr], "color_jitter_prob": p}`` — either key optional.

Inputs: ``images [B,H,W,3]`` float RGB, ``gt [B,pad,5]`` rows
``[yc, xc, h, w, class_id]`` padded with -1. Padding rows are left untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, -1)
    mn = jnp.min(rgb, -1)
    c = v - mn
    s = jnp.where(v > 0, c / jnp.maximum(v, 1e-12), 0.0)
    safe = jnp.maximum(c, 1e-12)
    hr = jnp.where(c > 0, ((g - b) / safe) % 6.0, 0.0)
    hg = jnp.where(c > 0, (b - r) / safe + 2.0, 0.0)
    hb = jnp.where(c > 0, (r - g) / safe + 4.0, 0.0)
    h = jnp.where(v == r, hr, jnp.where(v == g, hg, hb)) / 6.0
    return h, s, v


def _hsv_to_rgb(h, s, v):
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6).astype(jnp.int32) % 6
    f = h6 - jnp.floor(h6)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    choices = [
        jnp.stack([v, t, p], -1), jnp.stack([q, v, p], -1),
        jnp.stack([p, v, t], -1), jnp.stack([p, q, v], -1),
        jnp.stack([t, p, v], -1), jnp.stack([v, p, q], -1),
    ]
    out = jnp.zeros_like(choices[0])
    for k in range(6):
        out = jnp.where((i == k)[..., None], choices[k], out)
    return out


def _flip_gt(gt, flip, dim_size, coord):
    """Remap center coordinate ``coord`` (0=yc, 1=xc) for flipped samples.

    Scatter-free formulation (broadcast one-hot select instead of
    ``gt.at[..., coord].set``). Note: this was tried as a workaround for the
    RefineDet-family TPU worker fault at gt pad 60 (.convergence/bisect2.log —
    pad60+device-augment crashes on pure random data; pad60 alone and pad24+augment
    both pass) and does NOT avoid the fault — the select form is kept only because
    it is at least as cheap and avoids a scatter in the fused step."""
    valid = gt[..., 0] >= 0
    c = gt[..., coord]
    flipped = (dim_size - 1.0) - c
    c = jnp.where(jnp.logical_and(valid, flip[:, None]), flipped, c)
    onehot = jnp.arange(gt.shape[-1]) == coord
    return jnp.where(onehot, c[..., None], gt)


def apply(key, images, gt, cfg):
    """Batched device augmentation; see module docstring."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_td, k_lr, k_jit, k_bri, k_con, k_hue = jax.random.split(key, 6)

    flip_prob = cfg.get("flip_prob")
    if flip_prob is not None:
        td = jax.random.uniform(k_td, (b,)) < float(flip_prob[0])
        lr = jax.random.uniform(k_lr, (b,)) < float(flip_prob[1])
        images = jnp.where(td[:, None, None, None], images[:, ::-1], images)
        images = jnp.where(lr[:, None, None, None], images[:, :, ::-1], images)
        if gt is not None:
            gt = _flip_gt(gt, td, float(h), 0)
            gt = _flip_gt(gt, lr, float(w), 1)

    jitter = cfg.get("color_jitter_prob")
    if jitter is not None:
        do = jax.random.uniform(k_jit, (b, 3)) < float(jitter)
        delta_b = jax.random.uniform(k_bri, (b,), minval=0.0, maxval=0.3)
        images = images + jnp.where(do[:, 0], delta_b, 0.0)[:, None, None, None]
        factor = jax.random.uniform(k_con, (b,), minval=0.8, maxval=1.2)
        factor = jnp.where(do[:, 1], factor, 1.0)[:, None, None, None]
        mean = jnp.mean(images, axis=(1, 2), keepdims=True)
        images = (images - mean) * factor + mean
        delta_h = jax.random.uniform(k_hue, (b,), minval=-0.1, maxval=0.1)
        delta_h = jnp.where(do[:, 2], delta_h, 0.0)[:, None, None]
        hh, ss, vv = _rgb_to_hsv(images)
        images = _hsv_to_rgb(hh + delta_h, ss, vv)

    return images, gt
