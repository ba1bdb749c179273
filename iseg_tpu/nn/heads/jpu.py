"""Joint Pyramid Upsampling (FastFCN).

Parity with the reference ``layers/jpu.py:19`` ``JointPyramidUpsampling``:
conv each of the last three endpoints to a common width, upsample to the
finest of them, concat, then four parallel dilated separable convs
(rates 1/2/4/8) whose outputs concat into the head feature.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct, SepConvNormAct
from iseg_tpu.ops.resize import resize_image


class JointPyramidUpsampling(nn.Module):
    filters: int = 512
    dilation_rates: Sequence[int] = (1, 2, 4, 8)
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats = select_pyramid_endpoints(endpoints, 3)
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)

        convs = [
            ConvNormAct(filters=self.filters, kernel_size=3,
                        name=f"in_conv{i}", **common)(f, train=train)
            for i, f in enumerate(feats)
        ]
        target_hw = (convs[0].shape[1], convs[0].shape[2])
        convs = [
            c if c.shape[1:3] == target_hw else resize_image(c, target_hw, "bilinear")
            for c in convs
        ]
        x = jnp.concatenate([c.astype(convs[0].dtype) for c in convs], axis=-1)

        branches = [
            SepConvNormAct(filters=self.filters // len(self.dilation_rates) * 2,
                           kernel_size=3, dilation=rate,
                           name=f"dilated{rate}", **common)(x, train=train)
            for rate in self.dilation_rates
        ]
        return jnp.concatenate(branches, axis=-1)


JPU = JointPyramidUpsampling
