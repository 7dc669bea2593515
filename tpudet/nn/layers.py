"""Layer primitives shared by all backbones/heads.

Replaces the reference's per-model private ``_conv_layer``/``_bn``/``_load_conv_layer``
methods (SSD300.py:506-565 and clones) with flax modules. Conventions preserved from the
reference:

  * every ``ConvBN`` = conv (with bias) followed by BatchNorm — including prediction
    heads (quirk Q6, SURVEY.md §6.1);
  * BatchNorm matches tf.layers defaults: momentum 0.99, epsilon 1e-3, per-device batch
    stats (non-synced, like the reference single-device training);
  * convs use SAME padding and glorot-uniform kernels (tf.layers.conv2d defaults);
  * data layout is always NHWC (TPU-native); the model API layer transposes
    'channels_first' user inputs at the boundary.

Compute dtype is configurable: parameters live in float32, activations can run in
bfloat16 for the MXU (`dtype` attribute), with normalization statistics in float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv(+bias) -> BatchNorm -> optional activation (SSD300.py:523-537)."""

    filters: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    activation: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.filters,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class Conv(nn.Module):
    """Plain conv + bias + optional activation (no norm) — the reference's
    ``_load_conv_layer`` shape (SSD300.py:514-521) and raw heads where applicable."""

    filters: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    activation: Optional[Callable] = None
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.filters,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class BNActConv(nn.Module):
    """Pre-activation unit: BatchNorm -> activation -> conv (RetinaNet.py:594-619,
    FCOS uses the GroupNorm variant). ``bias_init_const`` supports RetinaNet's
    focal-loss prior bias ``-log((1-pi)/pi)`` on the class prediction conv."""

    filters: int
    kernel: int
    stride: int = 1
    activation: Optional[Callable] = nn.relu
    bias_init_const: Optional[float] = None
    norm: str = "bn"  # 'bn' | 'gn'
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.norm == "bn":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        else:
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype,
                             name="gn")(x)
        if self.activation is not None:
            x = self.activation(x)
        bias_init = (nn.initializers.constant(self.bias_init_const)
                     if self.bias_init_const is not None
                     else nn.initializers.zeros_init())
        return nn.Conv(
            self.filters, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_in",
                                                         "truncated_normal"),
            bias_init=bias_init, dtype=self.dtype, name="conv",
        )(x)


def resize_bilinear(x, out_h: int, out_w: int):
    """tf.image.resize_bilinear (align_corners=False) for FPN top-down upsampling
    (RetinaNet.py:309). Half-pixel-free TF1 default: scale = in/out, src = dst*scale."""
    import jax
    import jax.numpy as jnp2

    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    ys = jnp2.arange(out_h, dtype=jnp2.float32) * (h / out_h)
    xs = jnp2.arange(out_w, dtype=jnp2.float32) * (w / out_w)
    y0 = jnp2.clip(jnp2.floor(ys), 0, h - 1).astype(jnp2.int32)
    x0 = jnp2.clip(jnp2.floor(xs), 0, w - 1).astype(jnp2.int32)
    y1 = jnp2.minimum(y0 + 1, h - 1)
    x1 = jnp2.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(jnp2.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp2.float32))[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    del jax
    return top * (1 - wy) + bot * wy


class L2NormScale(nn.Module):
    """Channel-wise L2 normalization with ONE learned scalar scale (broadcast over
    channels), matching SSD300.py:74-83 where ``l2_norm_factor`` has shape [1] and is
    tiled across channels. ``init`` is 20 for SSD conv4_3, 10/8 for RefineDet."""

    init: float = 20.0

    @nn.compact
    def __call__(self, x):
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
        normed = (x.astype(jnp.float32) / jnp.maximum(norm, 1e-12)).astype(x.dtype)
        scale = self.param("scale", nn.initializers.constant(self.init), (1,))
        return normed * scale.astype(x.dtype)


def max_pool_same(x, window: int, stride: int):
    """tf.layers.max_pooling2d(padding='same') equivalent (SSD300.py:539-547)."""
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="SAME")


def avg_pool_same(x, window: int, stride: int):
    """tf.layers.average_pooling2d(padding='same') equivalent."""
    return nn.avg_pool(x, (window, window), strides=(stride, stride), padding="SAME")


class GroupNorm(nn.Module):
    """GroupNorm (FCOS uses groups=8, FCOS.py:438-446)."""

    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype)(x)
