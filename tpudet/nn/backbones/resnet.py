"""Configurable pre-activation ResNet (RetinaNet.py:258-285, FCOS.py:71-97).

Reference quirks preserved (SURVEY.md §6.1):
  * Q7 — stage widths derive from the 7x7 init kernel size: ``filters = [7 * 2^i]``
    for RetinaNet (FCOS uses ``[16 * 2^i]``, FCOS.py:31) — controlled by ``width_base``;
  * Q8 — the bottleneck variant convolves its shortcut with a 3x3 even at stride 1
    (no identity skip); the basic block keeps identity at stride 1.

``norm='gn'`` gives FCOS's GroupNorm-everywhere variant (FCOS.py:438-446).
Returns the last three stage endpoints (strides /8, /16, /32 for a 4-stage net).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import BNActConv, ConvBN, max_pool_same


class _BasicBlock(nn.Module):
    filters: int
    stride: int
    norm: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        conv = BNActConv(self.filters, 3, self.stride, norm=self.norm,
                         dtype=self.dtype, name="conv1")(x, train)
        conv = BNActConv(self.filters, 3, 1, norm=self.norm, dtype=self.dtype,
                         name="conv2")(conv, train)
        if self.stride != 1:
            shortcut = BNActConv(self.filters, 3, self.stride, norm=self.norm,
                                 dtype=self.dtype, name="shortcut")(x, train)
        else:
            shortcut = x
        return conv + shortcut


class _Bottleneck(nn.Module):
    filters: int
    stride: int
    norm: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        conv = BNActConv(self.filters, 1, 1, norm=self.norm, dtype=self.dtype,
                         name="conv1")(x, train)
        conv = BNActConv(self.filters, 3, self.stride, norm=self.norm,
                         dtype=self.dtype, name="conv2")(conv, train)
        conv = BNActConv(self.filters * 4, 1, 1, norm=self.norm, dtype=self.dtype,
                         name="conv3")(conv, train)
        # Q8: shortcut is always convolved (3x3), even at stride 1
        shortcut = BNActConv(self.filters * 4, 3, self.stride, norm=self.norm,
                             dtype=self.dtype, name="shortcut")(x, train)
        return conv + shortcut


class PreActResNet(nn.Module):
    """init 7x7 s2 ConvBN-ReLU -> 3x3 s2 maxpool -> pre-act residual stages."""

    block_list: Sequence[int]
    init_conv_filters: int = 16
    width_base: int = 7  # Q7: stage i width = width_base * 2^i
    is_bottleneck: bool = True
    norm: str = "bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        filters_list = [self.width_base * (2 ** i) for i in range(len(self.block_list))]
        if self.norm == "bn":
            x = ConvBN(self.init_conv_filters, 7, 2, activation=nn.relu,
                       dtype=self.dtype, name="init_conv")(x, train)
        else:
            # FCOS builds its init conv with GN too (conv -> gn -> relu)
            x = nn.Conv(self.init_conv_filters, (7, 7), strides=(2, 2), padding="SAME",
                        kernel_init=nn.initializers.variance_scaling(
                            2.0, "fan_in", "truncated_normal"),
                        dtype=self.dtype, name="init_conv")(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                             name="init_gn")(x)
            x = nn.relu(x)
        x = max_pool_same(x, 3, 2)
        block_cls = _Bottleneck if self.is_bottleneck else _BasicBlock
        endpoints = []
        for si, (reps, width) in enumerate(zip(self.block_list, filters_list)):
            for ui in range(reps):
                stride = 2 if (si > 0 and ui == 0) else 1
                x = block_cls(width, stride, self.norm, self.dtype,
                              name=f"block{si + 1}_unit{ui + 1}")(x, train)
            endpoints.append(x)
        return endpoints[-3], endpoints[-2], endpoints[-1]
