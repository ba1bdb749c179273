"""MOAT backbone (MObile-convolution + ATtention), variants 0-4.

Parity with the reference ``backbones/moat/`` (``MOAT`` ``moat.py:44``,
MBConv blocks + window attention with relative-position lookup
``attention.py:27,68,216``, survival-prob drop-path schedule ``moat.py:139``):
two MBConv stages then two MOAT stages, where a MOAT block = MBConv
(without SE) + window/global self-attention with relative position bias.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.backbones.swin import (
    WindowAttention,
    window_partition,
    window_reverse,
)
from iseg_tpu.nn.blocks import DropPath, SqueezeExcite
from iseg_tpu.nn.conv import ConvNormAct


class MOATMBConv(nn.Module):
    """Pre-norm MBConv (reference ``moat/moat.py`` mbconv): BN -> 1x1
    expand -> 3x3 dw -> (SE) -> 1x1 project, residual with drop-path."""

    filters: int
    stride: int = 1
    expand_ratio: int = 4
    use_se: bool = True
    drop_path: float = 0.0
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = x
        h = ConvNormAct(filters=in_ch * self.expand_ratio, kernel_size=1,
                        act="gelu", name="expand", **common)(x, train=train)
        h = ConvNormAct(filters=h.shape[-1], kernel_size=3, strides=self.stride,
                        groups=h.shape[-1], act="gelu",
                        name="depthwise", **common)(h, train=train)
        if self.use_se:
            h = SqueezeExcite(reduction_filters=max(1, in_ch // 4),
                              inner_act="silu", dtype=self.dtype,
                              param_dtype=self.param_dtype, name="se")(h)
        h = ConvNormAct(filters=self.filters, kernel_size=1, act=None,
                        name="project", **common)(h, train=train)
        if self.stride != 1 or in_ch != self.filters:
            if self.stride != 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2),
                                       padding="SAME")
            shortcut = nn.Conv(self.filters, (1, 1), dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="shortcut")(shortcut)
        h = DropPath(self.drop_path, name="dp")(h, deterministic=not train)
        return h + shortcut


class MOATAttentionBlock(nn.Module):
    """MOAT block = MBConv (no SE) + (windowed) MHSA with relative position
    bias (reference ``moat/attention.py``)."""

    filters: int
    num_heads: int
    stride: int = 1
    window_size: Optional[int] = None  # None = global attention
    drop_path: float = 0.0
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MOATMBConv(
            filters=self.filters, stride=self.stride, use_se=False,
            drop_path=self.drop_path, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="mbconv",
        )(x, train=train)

        n, h, w, c = x.shape
        shortcut = x
        hn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="attn_norm")(x)

        ws = self.window_size
        if ws is None or (h <= ws and w <= ws):
            # global attention over the whole map via one "window"
            ws_eff = max(h, w)
            ph, pw = (ws_eff - h % ws_eff) % ws_eff, (ws_eff - w % ws_eff) % ws_eff
            if ph or pw:
                hn = jnp.pad(hn, ((0, 0), (0, ph), (0, pw), (0, 0)))
            windows = hn.reshape(n, -1, c)
            attn = WindowAttention(
                dim=c, num_heads=self.num_heads, window_size=ws_eff,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
            )(windows)
            attn = attn.reshape(n, h + ph, w + pw, c)[:, :h, :w]
        else:
            ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
            if ph or pw:
                hn = jnp.pad(hn, ((0, 0), (0, ph), (0, pw), (0, 0)))
            windows = window_partition(hn, ws).reshape(-1, ws * ws, c)
            attn = WindowAttention(
                dim=c, num_heads=self.num_heads, window_size=ws,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
            )(windows)
            attn = window_reverse(attn.reshape(-1, ws, ws, c), ws, h + ph, w + pw)
            attn = attn[:, :h, :w]

        attn = DropPath(self.drop_path, name="dp")(attn, deterministic=not train)
        return shortcut + attn


class MOAT(nn.Module):
    stem_filters: int = 64
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 3, 7, 2)
    window_size: Optional[int] = 14  # stage-3 window; stage 4 is global
    drop_path_rate: float = 0.2
    survival_prob_lower: float = 0.8  # schedule target (reference moat.py:139)
    return_endpoints: bool = True
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = []
        common = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        x = ConvNormAct(filters=self.stem_filters, kernel_size=3, strides=2,
                        act="gelu", name="stem0", **common)(x, train=train)
        x = ConvNormAct(filters=self.stem_filters, kernel_size=3, act=None,
                        name="stem1", **common)(x, train=train)

        total = sum(self.depths)
        block_idx = 0
        heads_per_dim = 32
        for stage_idx, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            endpoints.append(x)
            for i in range(depth):
                drop = self.drop_path_rate * block_idx / max(1, total - 1)
                stride = 2 if i == 0 else 1
                if stage_idx < 2:
                    x = MOATMBConv(
                        filters=dim, stride=stride, drop_path=drop,
                        norm=self.norm, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"stage{stage_idx}_block{i}",
                    )(x, train=train)
                else:
                    x = MOATAttentionBlock(
                        filters=dim, num_heads=max(1, dim // heads_per_dim),
                        stride=stride,
                        window_size=self.window_size if stage_idx == 2 else None,
                        drop_path=drop, norm=self.norm, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"stage{stage_idx}_block{i}",
                    )(x, train=train)
                block_idx += 1

        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


_VARIANTS = {
    # name: (stem, dims, depths)
    "moat0": (64, (96, 192, 384, 768), (2, 3, 7, 2)),
    "moat1": (64, (96, 192, 384, 768), (2, 6, 14, 2)),
    "moat2": (128, (128, 256, 512, 1024), (2, 6, 14, 2)),
    "moat3": (160, (160, 320, 640, 1280), (2, 12, 28, 2)),
    "moat4": (256, (256, 512, 1024, 2048), (2, 12, 28, 2)),
}


def _make_ctor(name, stem, dims, depths):
    def ctor(output_stride=32, return_endpoints=True, **kwargs):
        del output_stride
        return MOAT(stem_filters=stem, dims=dims, depths=depths,
                    return_endpoints=return_endpoints, **kwargs)

    ctor.__name__ = name
    return ctor


for _name, (_s, _dims, _depths) in _VARIANTS.items():
    register_backbone(_name, _make_ctor(_name, _s, _dims, _depths))
