"""DarkNet backbones (YOLOv2.py:255-303, YOLOv3.py:387-394 + 485-507).

DarkNet-19: 18 ConvBN+LeakyReLU(0.1) layers with five 2x2 maxpools, stride 32; also
returns the lrelu17 endpoint used as YOLOv2's passthrough (same 1/32 resolution —
quirk Q14, the reference does not use a stride-16 layer or space-to-depth).

DarkNet-53: stride-2 ConvBN entry per stage + [1,2,8,8,4] residual units (1x1 half /
3x3 full convs, additive skip); returns (block5 /32, block4 /16, block3 /8).
YOLOv3's conv init is variance-scaling (he) per YOLOv3.py:502.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import ConvBN, max_pool_same


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class DarkNet19(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(ConvBN, activation=_leaky, dtype=self.dtype)
        x = conv(32, 3, name="conv1")(x, train)
        x = max_pool_same(x, 2, 2)
        x = conv(64, 3, name="conv2")(x, train)
        x = max_pool_same(x, 2, 2)
        x = conv(128, 3, name="conv3")(x, train)
        x = conv(64, 1, name="conv4")(x, train)
        x = conv(128, 3, name="conv5")(x, train)
        x = max_pool_same(x, 2, 2)
        x = conv(256, 3, name="conv6")(x, train)
        x = conv(128, 1, name="conv7")(x, train)
        x = conv(256, 3, name="conv8")(x, train)
        x = max_pool_same(x, 2, 2)
        x = conv(512, 3, name="conv9")(x, train)
        x = conv(256, 1, name="conv10")(x, train)
        x = conv(512, 3, name="conv11")(x, train)
        x = conv(256, 1, name="conv12")(x, train)
        x = conv(512, 3, name="conv13")(x, train)
        x = max_pool_same(x, 2, 2)
        x = conv(1024, 3, name="conv14")(x, train)
        x = conv(512, 1, name="conv15")(x, train)
        x = conv(1024, 3, name="conv16")(x, train)
        passthrough = conv(512, 1, name="conv17")(x, train)
        x = conv(1024, 3, name="conv18")(passthrough, train)
        return x, passthrough  # both stride 32 (Q14)


_HE = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


class _DarkConv(nn.Module):
    """ConvBN with he init and optional leaky activation (YOLOv3.py:494-507)."""

    filters: int
    kernel: int
    stride: int = 1
    is_activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    kernel_init=_HE, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        if self.is_activation:
            x = _leaky(x)
        return x


class _DarkBlock(nn.Module):
    filters: int
    units: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        x = _DarkConv(self.filters, 3, 2, dtype=self.dtype, name="down")(x, train)
        for i in range(self.units):
            y = _DarkConv(self.filters // 2, 1, dtype=self.dtype,
                          name=f"unit{i + 1}_conv1")(x, train)
            y = _DarkConv(self.filters, 3, dtype=self.dtype,
                          name=f"unit{i + 1}_conv2")(y, train)
            x = x + y
        return x


class DarkNet53(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = _DarkConv(32, 3, dtype=self.dtype, name="init_conv")(x, train)
        x = _DarkBlock(64, 1, self.dtype, name="block1")(x, train)
        x = _DarkBlock(128, 2, self.dtype, name="block2")(x, train)
        b3 = _DarkBlock(256, 8, self.dtype, name="block3")(x, train)
        b4 = _DarkBlock(512, 8, self.dtype, name="block4")(b3, train)
        b5 = _DarkBlock(1024, 4, self.dtype, name="block5")(b4, train)
        return b5, b4, b3
