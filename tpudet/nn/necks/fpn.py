"""FPN top-down neck, RetinaNet flavor (RetinaNet.py:137-144, 303-319).

P5 = 3x3 conv(C5); going down: lateral 1x1 conv + bilinear-upsampled running top-down
sum, then 3x3 conv for the output level (the raw sum, not the conv, feeds the next
level). P6/P7 are stride-2 3x3 convs stacked on P5 (P6/P7 for FCOS differ slightly and
live in the FCOS head). All convs are pre-activation BN(or GN)-ReLU-conv.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tpudet.nn.layers import BNActConv, resize_bilinear


class RetinaFPN(nn.Module):
    feature_size: int = 256
    num_extra_levels: int = 2  # P6, P7
    norm: str = "bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5, train: bool):
        p5 = BNActConv(self.feature_size, 3, 1, norm=self.norm, dtype=self.dtype,
                       name="p5_conv")(c5, train)
        lat4 = BNActConv(self.feature_size, 1, 1, norm=self.norm, dtype=self.dtype,
                         name="p4_lateral")(c4, train)
        td4 = lat4 + resize_bilinear(p5, lat4.shape[1], lat4.shape[2])
        p4 = BNActConv(self.feature_size, 3, 1, norm=self.norm, dtype=self.dtype,
                       name="p4_conv")(td4, train)
        lat3 = BNActConv(self.feature_size, 1, 1, norm=self.norm, dtype=self.dtype,
                         name="p3_lateral")(c3, train)
        td3 = lat3 + resize_bilinear(td4, lat3.shape[1], lat3.shape[2])
        p3 = BNActConv(self.feature_size, 3, 1, norm=self.norm, dtype=self.dtype,
                       name="p3_conv")(td3, train)
        levels = [p3, p4, p5]
        top = p5
        for i in range(self.num_extra_levels):
            top = BNActConv(self.feature_size, 3, 2, norm=self.norm, dtype=self.dtype,
                            name=f"p{6 + i}_conv")(top, train)
            levels.append(top)
        return levels
