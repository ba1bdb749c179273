"""Swin Transformer backbone (tiny/small/base/large).

Parity with the reference ``backbones/swin.py`` (``SwinTransformerModel``
:504, window partition/reverse :46,58, relative-position-bias
``WindowAttention`` :67, shifted-window blocks + computed attention masks
:179,391, ``PatchMerging`` :297, ``PatchEmbed`` :458).

TPU-first notes: window partition/reverse are pure reshape/transposes that
XLA fuses away; the shifted-window attention mask is a host-precomputed
numpy constant per static (H, W); attention runs via
``jax.nn.dot_product_attention`` with the relative-position bias folded into
the additive ``bias`` argument so the whole window batch hits one fused MXU
kernel.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.blocks import DropPath


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[B, H, W, C] -> [B*nH*nW, ws, ws, C] (reference ``swin.py:46``)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """Inverse of :func:`window_partition` (reference ``swin.py:58``)."""
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static [ws*ws, ws*ws] lookup into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Mask for shifted-window attention (reference ``swin.py:391``):
    [num_windows, N, N] additive mask, 0 for same-region, -100 across."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Window MHSA with relative position bias (reference ``swin.py:67``)."""

    dim: int
    num_heads: int
    window_size: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None):
        # x: [num_windows*B, N, C], mask: [num_windows, N, N] or None
        bnw, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads

        qkv = nn.Dense(3 * self.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bnw, n, self.num_heads, head_dim)
        k = k.reshape(bnw, n, self.num_heads, head_dim)
        v = v.reshape(bnw, n, self.num_heads, head_dim)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
            self.param_dtype,
        )
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = jnp.take(table, idx, axis=0).reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]  # [1, heads, N, N]

        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)[None, :, None]  # [1, nW, 1, N, N]
            full_bias = bias[:, None] + m  # [1, nW, heads, N, N]
            full_bias = jnp.broadcast_to(
                full_bias, (bnw // nw, nw, self.num_heads, n, n)
            ).reshape(bnw, self.num_heads, n, n)
        else:
            full_bias = jnp.broadcast_to(bias, (bnw, self.num_heads, n, n))

        out = jax.nn.dot_product_attention(q, k, v, bias=full_bias.astype(q.dtype))
        out = out.reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # the window size is FIXED like the reference's (maps smaller than
        # the window get padded up to it, swin.py:230-262 get_pad_values;
        # shift stays active): shrinking the window instead would make the
        # relative-position-bias table shape input-dependent, so published
        # checkpoints could not ingest at arbitrary build sizes
        ws = self.window_size
        shift = self.shift

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)

        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(hp, wp, ws, shift)
        else:
            mask = None

        windows = window_partition(x, ws).reshape(-1, ws * ws, c)
        attn = WindowAttention(
            dim=self.dim, num_heads=self.num_heads, window_size=ws,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(windows, mask=mask)
        x = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if ph or pw:
            x = x[:, :h, :w]

        x = shortcut + DropPath(self.drop_path, name="dp1")(
            x, deterministic=not train
        )

        hmlp = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="norm2")(x)
        hmlp = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="mlp_fc1")(hmlp)
        hmlp = nn.gelu(hmlp, approximate=False)
        hmlp = nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="mlp_fc2")(hmlp)
        return x + DropPath(self.drop_path, name="dp2")(hmlp, deterministic=not train)


class PatchMerging(nn.Module):
    """2x2 patch concat + linear reduce to 2*dim (reference ``swin.py:297``)."""

    out_dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ph, pw = h % 2, w % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            h, w = h + ph, w + pw
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    return_endpoints: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = []
        # patch embed -> os4 (reference swin.py:458)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="patch_norm")(x)
        # first endpoint is the patch embedding itself, pre-blocks
        # (reference swin.py:609)
        endpoints.append(x)

        total = sum(self.depths)
        block_idx = 0
        for stage_idx, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * (2 ** stage_idx)
            if stage_idx > 0:
                endpoints.append(x)
                x = PatchMerging(out_dim=dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"merge{stage_idx}")(x)
            for i in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=heads, window_size=self.window_size,
                    shift=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=self.drop_path_rate * block_idx / max(1, total - 1),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"stage{stage_idx}_block{i}",
                )(x, train=train)
                block_idx += 1

        # no final norm: the reference swin model ends at the last block
        # (swin.py:613-623; its endpoint list is [patch_embed, *stage-ends])
        endpoints.append(x)
        if self.return_endpoints:
            return endpoints
        return x


_VARIANTS = {
    # name: (embed_dim, depths, heads, window)
    "swin_tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
    "swin_small": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7),
    "swin_base": (128, (2, 2, 18, 2), (4, 8, 16, 32), 7),
    "swin_large": (192, (2, 2, 18, 2), (6, 12, 24, 48), 7),
    "swin_base_384": (128, (2, 2, 18, 2), (4, 8, 16, 32), 12),
    "swin_large_384": (192, (2, 2, 18, 2), (6, 12, 24, 48), 12),
    # reference vocabulary alias (static_strings SWIN_TINY_224)
    "swin_tiny_224": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
}


def _make_ctor(name, dim, depths, heads, window):
    def ctor(output_stride=32, return_endpoints=True, **kwargs):
        del output_stride  # hierarchy is fixed; heads consume the pyramid
        return SwinTransformer(
            embed_dim=dim, depths=depths, num_heads=heads, window_size=window,
            return_endpoints=return_endpoints, **kwargs,
        )

    ctor.__name__ = name
    return ctor


for _name, (_dim, _depths, _heads, _win) in _VARIANTS.items():
    register_backbone(_name, _make_ctor(_name, _dim, _depths, _heads, _win))
