"""MOAT backbone (MObile-convolution + ATtention), variants 0-4.

Parity with the reference ``backbones/moat/`` (``MOAT`` ``moat.py:44``,
``MBConvBlock``/``MOATBlock`` ``moat_blocks.py:121,263``, per-head
attention ``attention.py:216``): a two-conv stem, two MBConv stages, then
two MOAT stages. Blocks are pre-norm MBConvs (BN -> 1x1 expand (to
4*hidden) -> BN+gelu -> 3x3 dw -> BN+gelu -> [SE] -> biased 1x1 shrink)
with an avgpool(+biased 1x1) shortcut; MOAT blocks drop the SE and follow
with LayerNorm + multi-head attention (global by default — the reference's
``get_backbone`` builds MOAT with ``moat_use_pos_encoding=False`` and
whole-map windows; ``feature_extractor.py:47,75``), optionally windowed
with a resized 2-D relative-position bias.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.blocks import DropPath, SqueezeExcite
from iseg_tpu.nn.norm import normalization, resolve_bn_epsilon, resolve_bn_momentum


def _rel_pos_index(h: int, w: int) -> np.ndarray:
    """[h*w, h*w] flat indices into a (2h-1, 2w-1) relative-position grid
    (reference ``attention.py:68`` reindex_2d_einsum_lookup, computed as a
    host-side gather table instead of two einsum lookups)."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"),
                      axis=-1).reshape(-1, 2)
    rel = coords[None, :, :] - coords[:, None, :]  # [S, T, 2]
    rel_h = rel[..., 0] + h - 1
    rel_w = rel[..., 1] + w - 1
    return rel_h * (2 * w - 1) + rel_w


class MOATAttention(nn.Module):
    """Per-head q/k/v/o attention (reference ``attention.py:216``): kernels
    are stored fused [C, C] here and map 1:1 onto the reference's
    TrailDense [C, heads, head_dim] weights by reshape. Softmax in fp32.
    With ``rel_pos_grid`` a trainable relative-position bias (stored at
    ``pos_embedding_size`` resolution, bilinear-resized to the runtime
    window) is added to the logits (``attention.py:264-317``)."""

    dim: int
    num_heads: int
    window_hw: tuple[int, int]
    pos_embedding_size: Optional[int] = None  # None = no relative bias
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="q_proj")(x)
        k = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="k_proj")(x)
        v = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="v_proj")(x)
        q = q.reshape(b, s, self.num_heads, head_dim) * (head_dim ** -0.5)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)

        logits = jnp.einsum("bsnk,btnk->bnst", q, k)

        if self.pos_embedding_size is not None:
            wh, ww = self.window_hw
            p = self.pos_embedding_size
            table = self.param(
                "rel_pos_embed", nn.initializers.normal(0.02),
                (self.num_heads, 2 * p - 1, 2 * p - 1), self.param_dtype)
            if (2 * p - 1, 2 * p - 1) != (2 * wh - 1, 2 * ww - 1):
                table = jax.image.resize(
                    table, (self.num_heads, 2 * wh - 1, 2 * ww - 1),
                    method="bilinear")
            idx = jnp.asarray(_rel_pos_index(wh, ww))
            bias = jnp.take(table.reshape(self.num_heads, -1), idx, axis=1)
            logits = logits + bias.astype(logits.dtype)

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = probs.astype(v.dtype)
        out = jnp.einsum("bnst,btnk->bsnk", probs, v).reshape(b, s, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="o_proj")(out)


class MOATBlockBase(nn.Module):
    """Shared MBConv body (reference ``moat_blocks.py:121`` MBConvBlock /
    the mbconv half of ``MOATBlock`` :263)."""

    filters: int
    stride: int = 1
    expand_ratio: int = 4
    se_ratio: Optional[float] = 0.25  # None = no SE (MOAT blocks)
    survival_prob: Optional[float] = None
    use_attention: bool = False
    window_size: Optional[Sequence[int]] = None  # None = whole-map window
    pos_embedding_size: Optional[int] = None
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _bn(self, name):
        ctor = normalization(self.norm, dtype=self.dtype,
                             param_dtype=self.param_dtype)
        return ctor(name=name, momentum=resolve_bn_momentum(0.99),
                    epsilon=resolve_bn_epsilon(1e-3))

    def _drop(self, h, name, train):
        rate = 0.0
        if self.survival_prob is not None and 0 < self.survival_prob < 1:
            rate = 1.0 - self.survival_prob
        return DropPath(rate, name=name)(h, deterministic=not train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        inner = self.filters * self.expand_ratio
        bn_kw = dict(use_running_average=not train)

        shortcut = x
        if self.stride > 1:
            shortcut = nn.avg_pool(
                shortcut.astype(jnp.float32), (2, 2),
                strides=(self.stride, self.stride), padding="SAME",
            ).astype(x.dtype)
        if in_ch != self.filters:
            shortcut = nn.Conv(self.filters, (1, 1), use_bias=True,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="shortcut")(shortcut)

        h = self._bn("pre_norm")(x, **bn_kw)
        h = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="expand_conv")(h)
        # nested names expand/{conv,norm} would diverge from flax flat
        # modules; keep reference-shaped two-level paths via submodule dicts
        h = self._bn("expand_norm")(h, **bn_kw)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(inner, (3, 3), strides=(self.stride, self.stride),
                    feature_group_count=inner, padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="depthwise_conv")(h)
        h = self._bn("depthwise_norm")(h, **bn_kw)
        h = nn.gelu(h, approximate=False)
        if self.se_ratio is not None:
            h = SqueezeExcite(
                reduction_filters=max(1, int(self.filters * self.se_ratio)),
                inner_act="silu", dtype=self.dtype,
                param_dtype=self.param_dtype, name="se")(h)
        h = nn.Conv(self.filters, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="shrink_conv")(h)
        x = shortcut + self._drop(h, "dp_mbconv", train)

        if not self.use_attention:
            return x

        n, hh, ww, c = x.shape
        attn_shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="attn_norm")(x)

        if self.window_size is not None:
            wh, www = self.window_size
        else:
            wh, www = hh, ww
        ph = (wh - hh % wh) % wh
        pw = (www - ww % www) % www
        if ph or pw:
            h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = hh + ph, ww + pw
        h = h.reshape(n, hp // wh, wh, wp // www, www, c)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * www, c)

        h = MOATAttention(
            dim=c, num_heads=max(1, c // 32), window_hw=(wh, www),
            pos_embedding_size=self.pos_embedding_size,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn")(h)

        h = h.reshape(n, hp // wh, wp // www, wh, www, c)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp, wp, c)
        if ph or pw:
            h = h[:, :hh, :ww]
        return attn_shortcut + self._drop(h, "dp_attn", train)


class MOAT(nn.Module):
    stem_filters: int = 64
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 3, 7, 2)
    block_types: Sequence[str] = ("mbconv", "mbconv", "moat", "moat")
    # reference moat.py:36-42: stage position-embedding sizes when rel-pos
    # is on; get_backbone defaults rel-pos OFF for segmentation
    use_pos_emb: bool = False
    pos_emb_sizes: Sequence[Optional[int]] = (None, None, 14, 7)
    window_size: Optional[Sequence[int]] = None
    survival_prob: Optional[float] = 0.8
    return_endpoints: bool = True
    norm: str = "sync_batch_norm"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_kw = dict(use_running_average=not train)
        # stem (reference moat.py:115-137): norm+act after every conv but
        # the last
        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), use_bias=True,
                    padding="SAME", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="stem0_conv")(x)
        ctor = normalization(self.norm, dtype=self.dtype,
                             param_dtype=self.param_dtype)
        x = ctor(name="stem0_norm", momentum=resolve_bn_momentum(0.99),
                 epsilon=resolve_bn_epsilon(1e-3))(x, **bn_kw)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.stem_filters, (3, 3), use_bias=True, padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem1_conv")(x)

        endpoints = [x]
        total = sum(self.depths)
        block_id = 0
        for stage_idx, (dim, depth, btype) in enumerate(
                zip(self.dims, self.depths, self.block_types)):
            for i in range(depth):
                # reference moat.py:141-148: MBConv blocks get a linearly
                # decayed survival prob; MOAT blocks use the base value
                # (moat.py:205)
                sp = self.survival_prob
                if sp is not None and btype == "mbconv":
                    sp = 1.0 - (1.0 - sp) * block_id / total
                x = MOATBlockBase(
                    filters=dim, stride=2 if i == 0 else 1,
                    se_ratio=0.25 if btype == "mbconv" else None,
                    survival_prob=sp,
                    use_attention=(btype == "moat"),
                    window_size=self.window_size,
                    pos_embedding_size=(self.pos_emb_sizes[stage_idx]
                                        if self.use_pos_emb else None),
                    norm=self.norm, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"stage{stage_idx}_block{i}",
                )(x, train=train)
                block_id += 1
            endpoints.append(x)

        if self.return_endpoints:
            return endpoints  # [stem, os4, os8, os16, os32]
        return x


_VARIANTS = {
    # name: (stem, dims, depths, survival_prob) — reference moat.py:242-299
    "moat0": (64, (96, 192, 384, 768), (2, 3, 7, 2), 0.8),
    "moat1": (64, (96, 192, 384, 768), (2, 6, 14, 2), 0.7),
    "moat2": (128, (128, 256, 512, 1024), (2, 6, 14, 2), 0.7),
    "moat3": (160, (160, 320, 640, 1280), (2, 12, 28, 2), 0.4),
    "moat4": (256, (256, 512, 1024, 2048), (2, 12, 28, 2), 0.3),
}


def _make_ctor(name, stem, dims, depths, sp):
    def ctor(output_stride=32, return_endpoints=True, use_pos_emb=False,
             **kwargs):
        del output_stride
        return MOAT(stem_filters=stem, dims=dims, depths=depths,
                    survival_prob=sp, use_pos_emb=use_pos_emb,
                    return_endpoints=return_endpoints, **kwargs)

    ctor.__name__ = name
    return ctor


for _name, (_s, _dims, _depths, _sp) in _VARIANTS.items():
    register_backbone(_name, _make_ctor(_name, _s, _dims, _depths, _sp))
