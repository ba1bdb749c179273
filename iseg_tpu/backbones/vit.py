"""Vision Transformer backbone (ViT-B/L, + SAM variant).

Parity with the reference ``backbones/vit.py`` (``VisionTransformer`` :186,
pos-embed bicubic resampling for input-size freedom :19 /
``utils/common.py:206-263``): patch embed, class token, learned absolute
positional embedding resampled to the runtime grid, pre-LN transformer
blocks. Returns the spatial token map as a single endpoint.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.blocks import DropPath
from iseg_tpu.ops.resize import resample_abs_pos_embed


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        head_dim = self.dim // self.num_heads
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        b, n, _ = h.shape
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)
        attn = jax.nn.dot_product_attention(q, k, v).reshape(b, n, self.dim)
        attn = nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(attn)
        x = x + DropPath(self.drop_path, name="dp1")(attn, deterministic=not train)

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(h)
        return x + DropPath(self.drop_path, name="dp2")(h, deterministic=not train)


class VisionTransformer(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    use_class_token: bool = True
    pretrain_grid: int = 14  # 224/16: grid the pos-embed was trained at
    # the reference VisionTransformer has NO final LayerNorm
    # (``backbones/vit.py:279-320`` ends at the last block); default off for
    # pretrained-weight parity, on only for from-scratch recipes that want it
    use_final_norm: bool = False
    return_endpoints: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        if h % self.patch_size or w % self.patch_size:
            raise ValueError(
                f"input {h}x{w} must be a multiple of patch_size "
                f"{self.patch_size} (pad or bucket the input first)")
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)
        x = x.reshape(n, gh * gw, self.dim)

        prefix = 1 if self.use_class_token else 0
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.pretrain_grid * self.pretrain_grid + prefix, self.dim),
            self.param_dtype,
        )
        pos = resample_abs_pos_embed(
            pos_embed, (gh, gw), (self.pretrain_grid, self.pretrain_grid),
            num_prefix_tokens=prefix,
        )
        if self.use_class_token:
            cls = self.param("cls_token", nn.initializers.zeros_init(),
                             (1, 1, self.dim), self.param_dtype)
            x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.dim)), x], axis=1)
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            x = TransformerBlock(
                dim=self.dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                drop_path=self.drop_path_rate * i / max(1, self.depth - 1),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block{i}",
            )(x, train=train)
        if self.use_final_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(x)

        spatial = x[:, prefix:].reshape(n, gh, gw, self.dim)
        if self.return_endpoints:
            return [spatial]
        return spatial


_VARIANTS = {
    # name: (patch, dim, depth, heads, pretrain_grid) — grids match the
    # reference constructors (pretrain_size 384 -> grid 24; SAM 1024 -> 64,
    # no class token; reference ``backbones/vit.py:330-384``)
    "vit_small_patch16": (16, 384, 12, 6, 24),
    "vit_base_patch16": (16, 768, 12, 12, 24),
    "vit_large_patch16": (16, 1024, 24, 16, 24),
    "vit_base_patch16_sam": (16, 768, 12, 12, 64),
    "vit_large_patch16_sam": (16, 1024, 24, 16, 64),
}


def _make_ctor(name, patch, dim, depth, heads, grid):
    def ctor(output_stride=16, return_endpoints=True, **kwargs):
        del output_stride  # ViT is os=patch_size natively
        return VisionTransformer(
            patch_size=patch, dim=dim, depth=depth, num_heads=heads,
            pretrain_grid=grid,
            use_class_token="sam" not in name,
            return_endpoints=return_endpoints, **kwargs,
        )

    ctor.__name__ = name
    return ctor


for _name, (_p, _dim, _depth, _heads, _grid) in _VARIANTS.items():
    register_backbone(_name, _make_ctor(_name, _p, _dim, _depth, _heads, _grid))
