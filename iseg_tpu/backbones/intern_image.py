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
    # reference intern_image_layer.py:121-137: post-norm ordering (small
    # variant) applies norm1/norm2 AFTER dcn/mlp instead of before
    use_post_norm: bool = False
    dcn_sampling: str = "gather"
    dcn_max_local_offset: int = 2
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

        def norm(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)

        def mlp(h):
            h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                         param_dtype=self.param_dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(self.dim, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="mlp_fc2")(h)

        dcn = DCNv3(filters=self.dim, groups=self.groups,
                    sampling=self.dcn_sampling,
                    max_local_offset=self.dcn_max_local_offset,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype, name="dcn")

        if self.use_post_norm:
            h = norm("norm1")(dcn(x, train=train))
        else:
            h = dcn(norm("norm1")(x), train=train)
        x = x + DropPath(self.drop_path, name="dp1")(
            maybe_scale(h, "gamma1"), deterministic=not train
        )

        if self.use_post_norm:
            h = norm("norm2")(mlp(x))
        else:
            h = mlp(norm("norm2")(x))
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
    use_post_norm: bool = False
    # rematerialize blocks in backward (jax.checkpoint): the DCNv3 im2col
    # taps ([N,H,W,K*K,C] per group) dominate activation memory; remat
    # trades ~30% step time for fitting larger batches in HBM
    remat: bool = False
    # "dense_local" swaps the XLA-gather sampling for the gather-free
    # bounded-offset fast path (see nn.dcn.DCNv3.sampling)
    dcn_sampling: str = "gather"
    dcn_max_local_offset: int = 2
    # per-block (sampling, max_local_offset) overrides keyed by block name
    # ("stage{S}_block{I}") — written by backbones.pretrained's automatic
    # calibration on checkpoint ingest (VERDICT r2 #5); None = uniform
    dcn_overrides: Any = None
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
        x = nn.gelu(x, approximate=False)
        # reference stem_layer.py:60-69 + intern_image.py:126: the os2
        # feature after conv1/norm1/act is the first endpoint
        endpoints.append(x)
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
                # reference dowmsample_layer.py: bias-free strided conv + LN
                x = nn.Conv(dim, (3, 3), strides=(2, 2), padding="SAME",
                            use_bias=False,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"downsample{stage_idx}")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"downsample_norm{stage_idx}")(x)
            for i in range(depth):
                block_name = f"stage{stage_idx}_block{i}"
                sampling, r = self.dcn_sampling, self.dcn_max_local_offset
                if self.dcn_overrides and block_name in self.dcn_overrides:
                    sampling, r = self.dcn_overrides[block_name]
                x = block_cls(
                    dim=dim, groups=g, mlp_ratio=self.mlp_ratio,
                    drop_path=self.drop_path_rate * block_idx / max(1, total - 1),
                    layer_scale=self.layer_scale,
                    use_post_norm=self.use_post_norm,
                    dcn_sampling=sampling,
                    dcn_max_local_offset=r,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=block_name,
                )(x, train)
                block_idx += 1
            # trailing per-stage LN (reference intern_image_block.py:142-147
            # — present unless the post-norm ordering already normed the
            # last layer); endpoints are the normed pre-downsample features
            if not self.use_post_norm:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"stage{stage_idx}_norm")(x)
            endpoints.append(x)

        if self.return_endpoints:
            return endpoints
        return x


_VARIANTS = {
    # name: (channels, depths, groups, layer_scale, use_post_norm)
    # reference constructors intern_image.py:137-187 define tiny/small/
    # huge only (tiny: ls=1.0 pre-norm; small: ls=1.0 post-norm; huge:
    # no ls, pre-norm + res-post-norm extras we don't model). base/large
    # are beyond-reference additions following the small recipe (the
    # official InternImage-B/L geometry with post-norm), named to match
    # the reference's static_strings.py:104 placeholder.
    "intern_image_tiny": (64, (4, 4, 18, 4), (4, 8, 16, 32), 1.0, False),
    "intern_image_small": (80, (4, 4, 21, 4), (5, 10, 20, 40), 1.0, True),
    "intern_image_base": (112, (4, 4, 21, 4), (7, 14, 28, 56), 1.0, True),
    "intern_image_large": (160, (5, 5, 22, 5), (10, 20, 40, 80), 1.0, True),
    "intern_image_huge": (320, (6, 6, 32, 6), (10, 20, 40, 80), None, False),
}


def _make_ctor(name, ch, depths, groups, ls, post_norm):
    def ctor(output_stride=32, return_endpoints=True, **kwargs):
        del output_stride
        return InternImage(channels=ch, depths=depths, groups=groups,
                           layer_scale=ls, use_post_norm=post_norm,
                           return_endpoints=return_endpoints,
                           **kwargs)

    ctor.__name__ = name
    return ctor


for _name, (_ch, _d, _g, _ls, _pn) in _VARIANTS.items():
    register_backbone(_name, _make_ctor(_name, _ch, _d, _g, _ls, _pn))
