"""InternImage backbone (DCNv3-based).

Parity with the reference ``backbones/intern_image/`` (``InternImage``
``intern_image.py:16``, ``InternImageLayer`` ``intern_image_layer.py:17``):
conv stem to os4, four stages of (DCNv3 + LN + MLP) blocks with layer scale
and drop-path, strided-conv downsampling between stages.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.blocks import DropPath
from iseg_tpu.nn.dcn import DCNv3


class InternImageBlock(nn.Module):
    dim: int
    groups: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    layer_scale: Optional[float] = None
    dcn_sampling: str = "gather"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def maybe_scale(h, name):
            if self.layer_scale is None:
                return h
            gamma = self.param(name, nn.initializers.constant(self.layer_scale),
                               (self.dim,), self.param_dtype)
            return h * gamma

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        h = DCNv3(filters=self.dim, groups=self.groups,
                  sampling=self.dcn_sampling, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="dcn")(h, train=train)
        x = x + DropPath(self.drop_path, name="dp1")(
            maybe_scale(h, "gamma1"), deterministic=not train
        )

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(h)
        return x + DropPath(self.drop_path, name="dp2")(
            maybe_scale(h, "gamma2"), deterministic=not train
        )


class InternImage(nn.Module):
    channels: int = 64
    depths: Sequence[int] = (4, 4, 18, 4)
    groups: Sequence[int] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    layer_scale: Optional[float] = None
    # rematerialize blocks in backward (jax.checkpoint): the DCNv3 im2col
    # taps ([N,H,W,K*K,C] per group) dominate activation memory; remat
    # trades ~30% step time for fitting larger batches in HBM
    remat: bool = False
    # "dense_local" swaps the XLA-gather sampling for the gather-free
    # bounded-offset fast path (see nn.dcn.DCNv3.sampling)
    dcn_sampling: str = "gather" 
    return_endpoints: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = []
        # stem: two stride-2 convs -> os4 (reference intern_image.py)
        x = nn.Conv(self.channels // 2, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="stem_norm1")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="stem_norm2")(x)

        block_cls = InternImageBlock
        if self.remat:
            block_cls = nn.remat(InternImageBlock, static_argnums=(2,))

        total = sum(self.depths)
        block_idx = 0
        for stage_idx, (depth, g) in enumerate(zip(self.depths, self.groups)):
            dim = self.channels * (2 ** stage_idx)
            if stage_idx > 0:
                endpoints.append(x)
                x = nn.Conv(dim, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"downsample{stage_idx}")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"downsample_norm{stage_idx}")(x)
            for i in range(depth):
                x = block_cls(
                    dim=dim, groups=g, mlp_ratio=self.mlp_ratio,
                    drop_path=self.drop_path_rate * block_idx / max(1, total - 1),
                    layer_scale=self.layer_scale,
                    dcn_sampling=self.dcn_sampling,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"stage{stage_idx}_block{i}",
                )(x, train)
                block_idx += 1

        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


_VARIANTS = {
    # name: (channels, depths, groups, layer_scale)
    "intern_image_tiny": (64, (4, 4, 18, 4), (4, 8, 16, 32), None),
    "intern_image_small": (80, (4, 4, 21, 4), (5, 10, 20, 40), 1e-5),
    "intern_image_base": (112, (4, 4, 21, 4), (7, 14, 28, 56), 1e-5),
    "intern_image_large": (160, (5, 5, 22, 5), (10, 20, 40, 80), 1e-5),
    "intern_image_huge": (320, (6, 6, 32, 6), (10, 20, 40, 80), 1e-5),
}


def _make_ctor(name, ch, depths, groups, ls):
    def ctor(output_stride=32, return_endpoints=True, **kwargs):
        del output_stride
        return InternImage(channels=ch, depths=depths, groups=groups,
                           layer_scale=ls, return_endpoints=return_endpoints,
                           **kwargs)

    ctor.__name__ = name
    return ctor


for _name, (_ch, _d, _g, _ls) in _VARIANTS.items():
    register_backbone(_name, _make_ctor(_name, _ch, _d, _g, _ls))
