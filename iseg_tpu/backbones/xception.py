"""Xception-65 backbone (DeepLab variant).

Parity with the reference ``backbones/xception_common.py`` (``Xception``
:159, ``xception65`` :226, atrous rewrite :240): entry flow (3 downsampling
separable blocks), 16-block middle flow, exit flow; all convs separable with
BN between depthwise and pointwise. ``output_stride`` converts late strides
to dilation at construction time.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.conv import ConvNormAct, SepConvNormAct


class XceptionBlock(nn.Module):
    filters: Sequence[int]  # three separable conv widths
    stride: int = 1
    dilation: int = 1
    skip_type: str = "conv"  # "conv" | "sum" | "none"
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        h = x
        for i, f in enumerate(self.filters):
            stride = self.stride if i == len(self.filters) - 1 else 1
            h = SepConvNormAct(
                filters=f, kernel_size=3, strides=stride, dilation=self.dilation,
                # reference blocks use the pre-activation sepconv form
                # (XceptionDepthWiseConv activation=False,
                # xception_common.py:44-61)
                pre_act=True,
                name=f"sepconv{i}", **common,
            )(h, train=train)
        if self.skip_type == "conv":
            residual = ConvNormAct(
                filters=self.filters[-1], kernel_size=1, strides=self.stride,
                act=None, name="shortcut", **common,
            )(residual, train=train)
            h = h + residual
        elif self.skip_type == "sum":
            h = h + residual
        return h


class Xception(nn.Module):
    """Xception-65: entry 3 blocks, ``middle_blocks`` residual blocks,
    exit block + 3 final separable convs."""

    middle_blocks: int = 16
    output_stride: int = 32
    return_endpoints: bool = True
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        endpoints = []

        x = ConvNormAct(filters=32, kernel_size=3, strides=2, name="stem0", **common)(
            x, train=train
        )
        # first endpoint: after block1_conv1, before block1_conv2
        # (reference xception_common.py:180-186)
        endpoints.append(x)
        x = ConvNormAct(filters=64, kernel_size=3, name="stem1", **common)(
            x, train=train
        )
        current_stride, dilation = 2, 1

        entry_specs = [
            ((128, 128, 128), "entry_block1"),
            ((256, 256, 256), "entry_block2"),
            ((728, 728, 728), "entry_block3"),
        ]
        for filters, name in entry_specs:
            # reference build_atrous_xception (xception_common.py:242-258):
            # a de-strided block keeps the CURRENT rate; the rate doubles
            # only for the blocks after it (opposite order to resnet's)
            if current_stride >= self.output_stride:
                rate, stride = dilation, 1
                dilation *= 2
            else:
                rate, stride = dilation, 2
                current_stride *= 2
            # the reference taps an endpoint only before blocks that remain
            # strided after the atrous rewrite (xception_common.py:193-195)
            if stride == 2:
                endpoints.append(x)
            x = XceptionBlock(filters=filters, stride=stride, dilation=rate,
                              name=name, **common)(x, train=train)

        for i in range(self.middle_blocks):
            x = XceptionBlock(
                filters=(728, 728, 728), stride=1, dilation=dilation,
                skip_type="sum", name=f"middle_block{i}", **common,
            )(x, train=train)

        if current_stride >= self.output_stride:
            rate, stride = dilation, 1
            dilation *= 2
        else:
            rate, stride = dilation, 2
            current_stride *= 2
        if stride == 2:
            endpoints.append(x)
        x = XceptionBlock(filters=(728, 1024, 1024), stride=stride, dilation=rate,
                          name="exit_block", **common)(x, train=train)
        for i, f in enumerate((1536, 1536, 2048)):
            x = SepConvNormAct(filters=f, kernel_size=3, dilation=dilation,
                               name=f"exit_sepconv{i}", **common)(x, train=train)

        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


@register_backbone("xception65")
def xception65(output_stride: int = 32, return_endpoints: bool = True, **kwargs):
    return Xception(
        middle_blocks=16,
        output_stride=output_stride,
        return_endpoints=return_endpoints,
        **kwargs,
    )
