"""ConvNeXt (V1 + V2) backbone.

Parity with the reference ``backbones/convnext.py`` (``ConvNeXt`` :128,
dilated rewrite :245) and ``convnext_v2.py`` (GRN :17, :273): patchify stem,
four stages of depthwise-7x7 + LN + MLP blocks with layer-scale (V1) or
global-response-norm (V2), LN+2x2 downsample layers between stages.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.blocks import DropPath, GlobalResponseNorm


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: Optional[float] = 1e-6  # None for V2
    use_grn: bool = False  # True for V2
    dilation: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(
            self.dim, (7, 7), feature_group_count=self.dim,
            kernel_dilation=(self.dilation, self.dilation), padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        if self.use_grn:
            h = GlobalResponseNorm(param_dtype=self.param_dtype, name="grn")(h)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="pwconv2")(h)
        if self.layer_scale_init is not None:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
                self.param_dtype,
            )
            h = h * gamma
        h = DropPath(self.drop_path, name="drop_path")(h, deterministic=not train)
        return x + h


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    layer_scale_init: Optional[float] = 1e-6
    use_grn: bool = False
    output_stride: int = 32
    return_endpoints: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference convnext.py:180 seeds the endpoint list with a None
        # placeholder (there is no os2 feature); consumers index from the end
        endpoints = [None]
        # patchify stem -> os4
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="stem_norm")(x)

        total_blocks = sum(self.depths)
        block_idx = 0
        current_stride, dilation = 4, 1
        for stage_idx, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage_idx > 0:
                endpoints.append(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"downsample_norm{stage_idx}")(x)
                if current_stride >= self.output_stride:
                    # dilated rewrite (reference convnext.py:245): stride-2
                    # downsample becomes stride-1, blocks dilate
                    dilation *= 2
                    x = nn.Conv(dim, (2, 2), strides=(1, 1), padding="SAME",
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                name=f"downsample_conv{stage_idx}")(x)
                else:
                    current_stride *= 2
                    x = nn.Conv(dim, (2, 2), strides=(2, 2),
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                name=f"downsample_conv{stage_idx}")(x)
            for i in range(depth):
                x = ConvNeXtBlock(
                    dim=dim,
                    drop_path=self.drop_path_rate * block_idx / max(1, total_blocks - 1),
                    layer_scale_init=self.layer_scale_init,
                    use_grn=self.use_grn,
                    dilation=dilation,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"stage{stage_idx}_block{i}",
                )(x, train=train)
                block_idx += 1

        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


# name: (depths, dims)
_V1 = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    # reference vocabulary includes XXL (static_strings CONVNEXT_XXLARGE)
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}
_V2 = {
    "convnext_v2_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnext_v2_nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "convnext_v2_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_v2_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_v2_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_v2_huge": ((3, 3, 27, 3), (352, 704, 1408, 2816)),
}


def _make_ctor(name, depths, dims, v2):
    def ctor(output_stride=32, return_endpoints=True, **kwargs):
        return ConvNeXt(
            depths=depths,
            dims=dims,
            layer_scale_init=None if v2 else 1e-6,
            use_grn=v2,
            output_stride=output_stride,
            return_endpoints=return_endpoints,
            **kwargs,
        )

    ctor.__name__ = name
    return ctor


for _name, (_depths, _dims) in _V1.items():
    register_backbone(_name, _make_ctor(_name, _depths, _dims, v2=False))
for _name, (_depths, _dims) in _V2.items():
    register_backbone(_name, _make_ctor(_name, _depths, _dims, v2=True))
