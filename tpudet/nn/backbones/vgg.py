"""VGG-16 trunk + SSD extra stages.

TPU-native rendering of the reference's VGG feature extractors
(SSD300.py:192-314, SSD512.py, RefineDet.py:228-352, PFPNetR.py:230-315):
conv1_1..conv5_3 are plain conv+bias+ReLU layers (so TF-slim ``vgg_16.ckpt`` weights can
be injected 1:1 — see tpudet/runtime/pretrain.py), pool5 is a stride-1 SAME 3x3 maxpool,
conv6 is dilated by 2, and the extra stages are ConvBN+ReLU like the reference's
``_conv_layer`` (which always applies BatchNorm, quirk Q6).

Parameter names mirror the reference checkpoint layer names (conv1_1, ..., conv5_3) so
the pretrained-weight mapper is a pure name translation.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import Conv, ConvBN, max_pool_same

_VGG_CFG = (
    ("conv1", 64, 2),
    ("conv2", 128, 2),
    ("conv3", 256, 3),
    ("conv4", 512, 3),
    ("conv5", 512, 3),
)


class VGG16Trunk(nn.Module):
    """conv1_1 .. conv5_3 with 2x2 maxpools after blocks 1-4 (SSD300.py:192-303).

    Returns ``(conv4_3, conv5_3)`` endpoints: conv4_3 is pre-pool4 (stride 8),
    conv5_3 is the post-pool4 block-5 output (stride 16).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        endpoints = {}
        for bi, (block, width, reps) in enumerate(_VGG_CFG):
            for ri in range(reps):
                x = Conv(width, 3, activation=nn.relu, dtype=self.dtype,
                         name=f"{block}_{ri + 1}")(x)
            endpoints[f"{block}_{reps}"] = x
            if bi < 4:
                x = max_pool_same(x, 2, 2)
        return endpoints["conv4_3"], endpoints["conv5_3"]


class SSDVGGExtractor(nn.Module):
    """The full SSD feature extractor: VGG trunk + dilated conv6/conv7 + extras.

    ``extra_strides`` controls the conv8..convN extra stages: each entry builds a
    1x1 ConvBN bottleneck then a 3x3 ConvBN with that stride (SSD300.py:306-313 uses
    strides (2, 2, 1, 2); SSD512 appends one more stage).

    Returns the endpoint list [conv4_3, conv7, conv8_2, conv9_2, ...].
    """

    extra_widths: Sequence[int] = (512, 256, 256, 256)
    extra_strides: Sequence[int] = (2, 2, 1, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv4_3, conv5_3 = VGG16Trunk(dtype=self.dtype, name="vgg")(x)
        x = max_pool_same(conv5_3, 3, 1)  # pool5, stride 1 (SSD300.py:303)
        x = ConvBN(1024, 3, dilation=2, activation=nn.relu, dtype=self.dtype,
                   name="conv6")(x, train)
        conv7 = ConvBN(1024, 1, activation=nn.relu, dtype=self.dtype,
                       name="conv7")(x, train)
        feats = [conv4_3, conv7]
        x = conv7
        for i, (width, stride) in enumerate(zip(self.extra_widths, self.extra_strides)):
            x = ConvBN(width // 2, 1, activation=nn.relu, dtype=self.dtype,
                       name=f"conv{8 + i}_1")(x, train)
            x = ConvBN(width, 3, stride=stride, activation=nn.relu, dtype=self.dtype,
                       name=f"conv{8 + i}_2")(x, train)
            feats.append(x)
        return feats
