"""EfficientNet B0-B7 + L2 backbone.

Parity with the reference ``backbones/efficientnet.py`` (``EfficientNet``
:258, per-variant width/depth coefficients, dilated rewrite :492): MBConv
blocks with squeeze-excite, swish activation, and a linearly-scheduled
stochastic-depth (drop-connect) rate. ``output_stride`` converts late stage
strides to dilation at construction time.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.blocks import DropPath, SqueezeExcite
from iseg_tpu.nn.conv import ConvNormAct

_BN_EPS = 1e-3

# (kernel, repeats, in_filters, out_filters, expand_ratio, stride, se_ratio)
_B0_STAGES = (
    (3, 1, 32, 16, 1, 1, 0.25),
    (3, 2, 16, 24, 6, 2, 0.25),
    (5, 2, 24, 40, 6, 2, 0.25),
    (3, 3, 40, 80, 6, 2, 0.25),
    (5, 3, 80, 112, 6, 1, 0.25),
    (5, 4, 112, 192, 6, 2, 0.25),
    (3, 1, 192, 320, 6, 1, 0.25),
)

# name: (width_coefficient, depth_coefficient, dropout)
_VARIANTS = {
    "efficientnetb0": (1.0, 1.0, 0.2),
    "efficientnetb1": (1.0, 1.1, 0.2),
    "efficientnetb2": (1.1, 1.2, 0.3),
    "efficientnetb3": (1.2, 1.4, 0.3),
    "efficientnetb4": (1.4, 1.8, 0.4),
    "efficientnetb5": (1.6, 2.2, 0.4),
    "efficientnetb6": (1.8, 2.6, 0.5),
    "efficientnetb7": (2.0, 3.1, 0.5),
    "efficientnetl2": (4.3, 5.3, 0.5),
}


def _round_filters(filters: float, width: float, divisor: int = 8) -> int:
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class MBConv(nn.Module):
    out_filters: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    expand_ratio: int = 6
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        common = dict(norm=self.norm, bn_epsilon=_BN_EPS,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        h = x
        if self.expand_ratio != 1:
            h = ConvNormAct(filters=in_ch * self.expand_ratio, kernel_size=1,
                            act="silu", name="expand", **common)(h, train=train)
        h = ConvNormAct(filters=h.shape[-1], kernel_size=self.kernel_size,
                        strides=self.stride, dilation=self.dilation,
                        groups=h.shape[-1], act="silu",
                        name="depthwise", **common)(h, train=train)
        if self.se_ratio:
            h = SqueezeExcite(
                reduction_filters=max(1, int(in_ch * self.se_ratio)),
                inner_act="silu", dtype=self.dtype, param_dtype=self.param_dtype,
                name="se",
            )(h)
        h = ConvNormAct(filters=self.out_filters, kernel_size=1, act=None,
                        name="project", **common)(h, train=train)
        if self.stride == 1 and in_ch == self.out_filters:
            h = DropPath(self.drop_rate, name="drop_path")(
                h, deterministic=not train
            )
            h = h + x
        return h


class EfficientNet(nn.Module):
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    output_stride: int = 32
    drop_connect_rate: float = 0.2
    return_endpoints: bool = True
    include_top_conv: bool = True  # top_conv is the final endpoint in the
    # reference (efficientnet.py:362-367, use_top=True default)
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(norm=self.norm, bn_epsilon=_BN_EPS,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        endpoints = []

        x = ConvNormAct(
            filters=_round_filters(32, self.width_coefficient), kernel_size=3,
            strides=2, act="silu", name="stem", **common,
        )(x, train=train)

        current_stride, dilation = 2, 1
        total_blocks = sum(
            _round_repeats(r, self.depth_coefficient) for (_, r, *_rest) in _B0_STAGES
        )
        block_idx = 0
        for stage_idx, (k, r, fin, fout, e, s, se) in enumerate(_B0_STAGES):
            out_f = _round_filters(fout, self.width_coefficient)
            repeats = _round_repeats(r, self.depth_coefficient)
            for i in range(repeats):
                stride = s if i == 0 else 1
                if stride > 1:
                    endpoints.append(x)
                    if current_stride >= self.output_stride:
                        dilation *= stride  # dilated rewrite (:492)
                        stride = 1
                    else:
                        current_stride *= 2
                x = MBConv(
                    out_filters=out_f, kernel_size=k, stride=stride,
                    dilation=dilation, expand_ratio=e, se_ratio=se,
                    drop_rate=self.drop_connect_rate * block_idx / total_blocks,
                    norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"block_{stage_idx}_{i}",
                )(x, train=train)
                block_idx += 1

        if self.include_top_conv:
            x = ConvNormAct(
                filters=_round_filters(1280, self.width_coefficient),
                kernel_size=1, act="silu", name="top_conv", **common,
            )(x, train=train)

        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


def _make_ctor(name, width, depth):
    def ctor(output_stride=32, return_endpoints=True, **kwargs):
        return EfficientNet(
            width_coefficient=width,
            depth_coefficient=depth,
            output_stride=output_stride,
            return_endpoints=return_endpoints,
            **kwargs,
        )

    ctor.__name__ = name
    return ctor


for _name, (_w, _d, _do) in _VARIANTS.items():
    register_backbone(_name, _make_ctor(_name, _w, _d))
