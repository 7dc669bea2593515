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
