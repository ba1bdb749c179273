"""Attention layers over 2-D feature maps.

Parity with the reference's attention family:
``layers/multihead_self_attention.py:16`` (MHSA with NaN guards + masked
softmax and an XLA fast path :153-155), ``layers/multihead_axial_attention.py:15``
(H-then-W axial attention), ``layers/self_attention.py:15`` (single-head).

TPU-first: the core product uses ``jax.nn.dot_product_attention`` — XLA
fuses it into a flash-attention-style kernel on TPU MXU — with logits kept
in fp32. The reference's eager/XLA path switch disappears: everything is
compiled.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.ops.numerics import replace_non_finite


def flatten_hw(x: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, H*W, C] (reference ``utils/attention_utils.py``)."""
    return x.reshape(x.shape[0], -1, x.shape[-1])


def get_attention(
    query: jax.Array,
    key: jax.Array,
    apply_scale: bool = False,
    numeric_stable: bool = False,
) -> jax.Array:
    """Plain attention-matrix softmax(Q K) (reference
    ``utils/attention_utils.py:24`` — fp32 softmax when
    ``numeric_stable``)."""
    orig_dtype = query.dtype
    if numeric_stable:
        query = query.astype(jnp.float32)
        key = key.astype(jnp.float32)
    logits = jnp.einsum("bic,bjc->bij", query, key)
    if apply_scale:
        logits = logits / jnp.sqrt(jnp.asarray(query.shape[-1], logits.dtype))
    attn = jax.nn.softmax(logits, axis=-1)
    return attn.astype(orig_dtype) if numeric_stable else attn


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    guard_numerics: bool = False,
) -> jax.Array:
    """[B, N, H, D] q/k/v -> [B, N, H, D]. fp32 softmax accumulation."""
    out = jax.nn.dot_product_attention(q, k, v, mask=mask)
    if guard_numerics:
        out = replace_non_finite(out)
    return out


class MultiHeadSelfAttention2D(nn.Module):
    """MHSA over an NHWC map: flatten HW -> attention -> restore
    (reference ``multihead_self_attention.py:16``)."""

    num_heads: int = 8
    filters: Optional[int] = None  # default: input channels
    out_filters: Optional[int] = None
    use_bias: bool = True
    guard_numerics: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        n, h, w, c = x.shape
        inner = self.filters or c
        out_ch = self.out_filters or c
        head_dim = inner // self.num_heads
        if head_dim * self.num_heads != inner:
            raise ValueError(f"filters {inner} not divisible by heads {self.num_heads}")

        qkv = nn.Dense(3 * inner, use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x.reshape(n, h * w, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, h * w, self.num_heads, head_dim)
        k = k.reshape(n, h * w, self.num_heads, head_dim)
        v = v.reshape(n, h * w, self.num_heads, head_dim)

        out = dot_product_attention(q, k, v, mask=mask,
                                    guard_numerics=self.guard_numerics)
        out = out.reshape(n, h * w, inner)
        out = nn.Dense(out_ch, use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="proj")(out)
        return out.reshape(n, h, w, out_ch)


class MultiHeadAxialAttention2D(nn.Module):
    """Axial attention: attend along H, then along W
    (reference ``multihead_axial_attention.py:15``). O(HW*(H+W)) instead of
    O((HW)^2) — the windowed-cost structure that bounds large-image cost."""

    num_heads: int = 8
    filters: Optional[int] = None
    guard_numerics: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        inner = self.filters or c
        if inner % self.num_heads != 0:
            raise ValueError(
                f"filters {inner} not divisible by heads {self.num_heads}")
        head_dim = inner // self.num_heads

        def axial(x_seq, name):
            # x_seq: [B*, L, C] -> attention along L
            b, l, cc = x_seq.shape
            qkv = nn.Dense(3 * inner, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=f"{name}_qkv")(x_seq)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, l, self.num_heads, head_dim)
            k = k.reshape(b, l, self.num_heads, head_dim)
            v = v.reshape(b, l, self.num_heads, head_dim)
            out = dot_product_attention(q, k, v, guard_numerics=self.guard_numerics)
            out = out.reshape(b, l, inner)
            return nn.Dense(cc, dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"{name}_proj")(out)

        # H axis: treat each column as a sequence
        xh = x.transpose(0, 2, 1, 3).reshape(n * w, h, c)
        xh = axial(xh, "h_axis")
        x = x + xh.reshape(n, w, h, c).transpose(0, 2, 1, 3)

        # W axis: each row as a sequence
        xw = x.reshape(n * h, w, c)
        xw = axial(xw, "w_axis")
        x = x + xw.reshape(n, h, w, c)
        return x


class DeformableMultiHeadAttention2D(nn.Module):
    """Deformable-DETR-style sampled attention
    (reference ``layers/deformable_multihead_self_attention.py:13``:
    offset grids :89, bilinear gather :102-175, XLA path :247).

    Each query predicts ``num_points`` sampling locations + softmax weights
    per head; values are bilinearly sampled there and weight-summed — O(HW *
    heads * points) instead of O((HW)^2). Sampling reuses the DCN gather
    core (one batched im2col-style gather -> MXU-friendly reductions)."""

    num_heads: int = 8
    num_points: int = 4
    filters: Optional[int] = None
    offset_scale: float = 1.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from iseg_tpu.ops.deform import bilinear_gather

        n, h, w, c = x.shape
        inner = self.filters or c
        g, p = self.num_heads, self.num_points
        if inner % g != 0:
            raise ValueError(f"filters {inner} not divisible by heads {g}")
        head_dim = inner // g

        value = nn.Dense(inner, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="value")(x)
        offsets = nn.Dense(g * p * 2, kernel_init=nn.initializers.zeros_init(),
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="offsets")(x)
        weights = nn.Dense(g * p, kernel_init=nn.initializers.zeros_init(),
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="weights")(x)
        weights = jax.nn.softmax(
            weights.reshape(n, h, w, g, p).astype(jnp.float32), axis=-1
        ).astype(value.dtype)
        offsets = offsets.reshape(n, h, w, g, p, 2).astype(jnp.float32)
        offsets = offsets * self.offset_scale

        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        base = jnp.stack([gy, gx], -1)[None, :, :, None, None, :]  # [1,H,W,1,1,2]
        coords = base + offsets  # [N,H,W,g,p,2]

        # fold heads into the batch dim: ONE gather covers every head (a
        # per-head python loop duplicates the gather pipeline g times in
        # the HLO — same rationale as DCNv3's group folding, dcn.py)
        vg = (value.reshape(n, h, w, g, head_dim)
              .transpose(0, 3, 1, 2, 4).reshape(n * g, h, w, head_dim))
        coords_b = (coords.transpose(0, 3, 1, 2, 4, 5)
                    .reshape(n * g, h * w * p, 2))
        sampled = bilinear_gather(vg, coords_b).reshape(n, g, h, w, p, head_dim)
        out = jnp.einsum("nghwpd,nhwgp->nhwgd", sampled, weights)
        out = out.reshape(n, h, w, g * head_dim)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj")(out)
        return x + out


class SelfAttention2D(nn.Module):
    """Single-head non-local self-attention with 1x1 conv projections
    (reference ``self_attention.py:15``)."""

    filters: Optional[int] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        inner = self.filters or max(1, c // 8)
        conv = lambda f, name: nn.Conv(f, (1, 1), dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        q = conv(inner, "q")(x).reshape(n, h * w, inner)
        k = conv(inner, "k")(x).reshape(n, h * w, inner)
        v = conv(c, "v")(x).reshape(n, h * w, c)

        logits = jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(inner), axis=-1).astype(x.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros_init(), (),
                           self.param_dtype)
        return x + gamma * out
