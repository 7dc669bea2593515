"""DLA-lite backbone + iterative deconv upsampling (CenterNet.py:72-129).

Structure: 3 stem ConvBN-ReLU (16/7x7, 16/3x3, 32/3x3 s2), then four recursive DLA
stages (64/128/256/512) each followed by a 2x2 maxpool, with 1x1-conv + 2x2-avgpool
residual links between stages 4-6; the upsampling neck fuses stages 4/5/6 down to a
stride-4 feature map via 4x4 stride-2 transposed convs.

The reference's basic block picks identity vs 1x1-conv shortcut with a runtime channel
check inside tf.cond (CenterNet.py:378-388) — both branches' variables always exist;
here the choice is static (channels known at trace time) but the conv shortcut
parameters are created unconditionally to keep the same parameter structure.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import ConvBN, avg_pool_same, max_pool_same


class _DeconvBN(nn.Module):
    filters: int
    kernel: int = 4
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.filters, (self.kernel, self.kernel),
                             strides=(self.stride, self.stride), padding="SAME",
                             dtype=self.dtype, name="dconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class _BasicBlock(nn.Module):
    filters: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        conv = ConvBN(self.filters, 3, activation=nn.relu, dtype=self.dtype,
                      name="conv1")(x, train)
        conv = ConvBN(self.filters, 3, activation=nn.relu, dtype=self.dtype,
                      name="conv2")(conv, train)
        shortcut = ConvBN(self.filters, 1, activation=nn.relu, dtype=self.dtype,
                          name="shortcut")(x, train)
        if x.shape[-1] == self.filters:
            shortcut = x  # runtime tf.cond picks identity when channels match
        return conv + shortcut


class _DLATree(nn.Module):
    filters: int
    levels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool):
        if self.levels == 1:
            b1 = _BasicBlock(self.filters, self.dtype, name="block1")(x, train)
            b2 = _BasicBlock(self.filters, self.dtype, name="block2")(b1, train)
        else:
            b1 = _DLATree(self.filters, self.levels - 1, self.dtype,
                          name="tree1")(x, train)
            b2 = _DLATree(self.filters, self.levels - 1, self.dtype,
                          name="tree2")(b1, train)
        return ConvBN(self.filters, 3, activation=nn.relu, dtype=self.dtype,
                      name="aggregate")(b1 + b2, train)


class DLABackbone(nn.Module):
    """Returns (stage4 /8, stage5 /16, stage6 /32)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBN(16, 7, activation=nn.relu, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBN(16, 3, activation=nn.relu, dtype=self.dtype, name="stem2")(x, train)
        x = ConvBN(32, 3, stride=2, activation=nn.relu, dtype=self.dtype,
                   name="stem3")(x, train)
        s3 = _DLATree(64, 1, self.dtype, name="stage3")(x, train)
        s3 = max_pool_same(s3, 2, 2)

        s4 = _DLATree(128, 2, self.dtype, name="stage4")(s3, train)
        res = ConvBN(128, 1, activation=nn.relu, dtype=self.dtype,
                     name="stage4_residual")(s3, train)
        s4 = max_pool_same(s4, 2, 2) + avg_pool_same(res, 2, 2)

        s5 = _DLATree(256, 2, self.dtype, name="stage5")(s4, train)
        res = ConvBN(256, 1, activation=nn.relu, dtype=self.dtype,
                     name="stage5_residual")(s4, train)
        s5 = max_pool_same(s5, 2, 2) + avg_pool_same(res, 2, 2)

        s6 = _DLATree(512, 1, self.dtype, name="stage6")(s5, train)
        res = ConvBN(512, 1, activation=nn.relu, dtype=self.dtype,
                     name="stage6_residual")(s5, train)
        s6 = max_pool_same(s6, 2, 2) + avg_pool_same(res, 2, 2)
        return s4, s5, s6


class DLAUp(nn.Module):
    """Iterative deconv fusion of stages 4-6 to stride 4 (CenterNet.py:112-129)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s4, s5, s6, train: bool):
        s6 = ConvBN(256, 1, activation=nn.relu, dtype=self.dtype,
                    name="s6_proj")(s6, train)
        s6_5 = _DeconvBN(256, dtype=self.dtype, name="s6_up1")(s6, train)
        s6_4 = _DeconvBN(256, dtype=self.dtype, name="s6_up2")(s6_5, train)
        s6_3 = _DeconvBN(256, dtype=self.dtype, name="s6_up3")(s6_4, train)

        s5 = ConvBN(256, 1, activation=nn.relu, dtype=self.dtype,
                    name="s5_proj")(s5, train)
        s5_4 = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                      name="s5_fuse")(s5 + s6_5, train)
        s5_4 = _DeconvBN(256, dtype=self.dtype, name="s5_up1")(s5_4, train)
        s5_3 = _DeconvBN(256, dtype=self.dtype, name="s5_up2")(s5_4, train)

        s4 = ConvBN(256, 1, activation=nn.relu, dtype=self.dtype,
                    name="s4_proj")(s4, train)
        s4_3 = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                      name="s4_fuse")(s4 + s5_4 + s6_4, train)
        s4_3 = _DeconvBN(256, dtype=self.dtype, name="s4_up1")(s4_3, train)

        f = ConvBN(256, 3, activation=nn.relu, dtype=self.dtype,
                   name="out_conv1")(s6_3 + s5_3 + s4_3, train)
        return ConvBN(256, 1, activation=nn.relu, dtype=self.dtype,
                      name="out_conv2")(f, train)
