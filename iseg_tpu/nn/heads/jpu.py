"""Joint Pyramid Upsampling (FastFCN).

Parity with the reference ``layers/jpu.py:19`` ``JointPyramidUpsampling``:
3x3 ConvNormAct each of the last three endpoints to ``width`` channels,
bilinear-upsample to the finest of them, concat, then four parallel
branches (dilation rates 1/2/4/8) of depthwise 3x3 conv (WITH bias, no
act) -> BN -> 1x1 ConvNormAct(``width``); the four ``width``-channel
branch outputs concat into the ``4 * width``-channel head feature.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.nn.conv import ConvNormAct, _bn_kwargs
from iseg_tpu.nn.norm import normalization
from iseg_tpu.ops.resize import resize_image


class JointPyramidUpsampling(nn.Module):
    filters: int = 512  # the reference's ``width`` (``layers/jpu.py:20``)
    dilation_rates: Sequence[int] = (1, 2, 4, 8)
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints, train: bool = False):
        from iseg_tpu.nn.heads.common import select_pyramid_endpoints

        feats = select_pyramid_endpoints(endpoints, 3)
        common = dict(norm=self.norm, dtype=self.dtype,
                      param_dtype=self.param_dtype)

        convs = [
            ConvNormAct(filters=self.filters, kernel_size=3, act="relu",
                        name=f"endpoint_conv{i}", **common)(f, train=train)
            for i, f in enumerate(feats)
        ]
        target_hw = (convs[0].shape[1], convs[0].shape[2])
        convs = [
            c if c.shape[1:3] == target_hw
            else resize_image(c, target_hw, "bilinear")
            for c in convs
        ]
        x = jnp.concatenate([c.astype(convs[0].dtype) for c in convs],
                            axis=-1)

        branches = []
        for rate in self.dilation_rates:
            # reference branch (``layers/jpu.py:40-59``): DepthwiseConv2D
            # (keras default use_bias=True, no activation) -> BN -> 1x1
            # ConvNormAct(width)
            h = nn.Conv(
                features=x.shape[-1], kernel_size=(3, 3),
                kernel_dilation=(rate, rate), padding="SAME",
                feature_group_count=x.shape[-1], use_bias=True,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"dw_conv{rate}",
            )(x)
            norm_ctor = normalization(self.norm, dtype=self.dtype,
                                      param_dtype=self.param_dtype)
            h = norm_ctor(name=f"dw_norm{rate}",
                          **_bn_kwargs(self.norm, train))(h)
            h = ConvNormAct(filters=self.filters, kernel_size=1, act="relu",
                            name=f"pw_conv{rate}", **common)(h, train=train)
            branches.append(h)
        return jnp.concatenate(branches, axis=-1)


JPU = JointPyramidUpsampling
