"""MobileNetV2 backbone.

Parity with the reference's ``backbones/mobilenetv2_common.py:16``
``MobileNetV2`` including the atrous rewrite (:204) — here expressed as a
construction-time ``output_stride``: once the cumulative stride reaches it,
further stage strides become 1 and dilation multiplies up instead, matching
the reference's post-build mutation semantics.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.conv import ConvNormAct

# (expansion t, channels c, repeats n, stride s) — the MobileNetV2 paper's
# table 2 stages, as built by the reference.
_MBV2_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    filters: int
    stride: int
    expansion: int
    dilation: int = 1
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        if self.expansion != 1:
            h = ConvNormAct(
                filters=in_ch * self.expansion, kernel_size=1,
                norm=self.norm, act="relu6",
                dtype=self.dtype, param_dtype=self.param_dtype, name="expand",
            )(h, train=train)
        h = ConvNormAct(
            filters=h.shape[-1], kernel_size=3, strides=self.stride,
            dilation=self.dilation, groups=h.shape[-1],
            norm=self.norm, act="relu6",
            dtype=self.dtype, param_dtype=self.param_dtype, name="depthwise",
        )(h, train=train)
        h = ConvNormAct(
            filters=self.filters, kernel_size=1, norm=self.norm, act=None,
            dtype=self.dtype, param_dtype=self.param_dtype, name="project",
        )(h, train=train)
        if self.stride == 1 and in_ch == self.filters:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    """Input-size-free MobileNetV2 returning endpoints at each stride
    boundary (os 2/4/8/16/32) like the reference feature extractor."""

    output_stride: int = 32
    width_multiplier: float = 1.0
    return_endpoints: bool = True
    include_top_conv: bool = True  # Conv_1 1280 top conv — part of the
    # reference forward and its final endpoint (mobilenetv2_common.py:59-63)
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = []
        current_stride = 2
        dilation = 1

        stem_ch = _make_divisible(32 * self.width_multiplier)
        x = ConvNormAct(
            filters=stem_ch, kernel_size=3, strides=2, norm=self.norm, act="relu6",
            dtype=self.dtype, param_dtype=self.param_dtype, name="stem",
        )(x, train=train)

        block_idx = 0
        for t, c, n, s in _MBV2_STAGES:
            out_ch = _make_divisible(c * self.width_multiplier)
            for i in range(n):
                stride = s if i == 0 else 1
                if stride > 1:
                    # endpoint taps stay fixed whether or not the block is
                    # dilated (atrous rewrite, reference mobilenetv2_common.py:204)
                    endpoints.append(x)
                    if current_stride >= self.output_stride:
                        dilation *= stride
                        stride = 1
                    else:
                        current_stride *= 2
                x = InvertedResidual(
                    filters=out_ch, stride=stride, expansion=t, dilation=dilation,
                    norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"block_{block_idx}",
                )(x, train=train)
                block_idx += 1

        if self.include_top_conv:
            x = ConvNormAct(
                filters=_make_divisible(1280 * max(1.0, self.width_multiplier)),
                kernel_size=1, norm=self.norm, act="relu6",
                dtype=self.dtype, param_dtype=self.param_dtype, name="top_conv",
            )(x, train=train)

        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


@register_backbone("mobilenetv2")
def mobilenetv2(
    output_stride: int = 32,
    return_endpoints: bool = True,
    width_multiplier: float = 1.0,
    **kwargs,
) -> MobileNetV2:
    return MobileNetV2(
        output_stride=output_stride,
        return_endpoints=return_endpoints,
        width_multiplier=width_multiplier,
        **kwargs,
    )
