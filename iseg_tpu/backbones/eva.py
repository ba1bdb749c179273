"""EVA02 backbone (tiny/small/base/large).

Parity with the reference ``backbones/eva/`` (``Eva`` ``eva.py:22``, 2-D
rotary embedding ``rotar_embedding_cat.py:124,162``, SwiGLU ``swiglu.py:13``
/ GluMlp ``glumlp.py:13``, patch dropout ``patch_dropout.py:13``, layerwise
LR decay hook ``eva.py:254``): a ViT with axial 2-D RoPE on q/k, SwiGLU MLP
with sub-LayerNorm, and optional train-time patch dropout.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones.registry import register_backbone
from iseg_tpu.nn.blocks import DropPath


def build_rope_2d(gh: int, gw: int, head_dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Axial 2-D rotary angles, 'cat' layout (reference
    ``rotar_embedding_cat.py:124-162``): half the rotary dims carry the
    H coordinate, half the W. Returns (sin, cos) [gh*gw, head_dim]."""
    quarter = head_dim // 4
    inv = 1.0 / (100.0 ** (np.arange(quarter) / quarter))
    ang_h = np.outer(np.arange(gh), inv)  # [gh, q]
    ang_w = np.outer(np.arange(gw), inv)  # [gw, q]
    # token (i, j) -> concat(ang_h[i], ang_w[j]) of size head_dim//2
    ah = np.repeat(ang_h[:, None, :], gw, axis=1)
    aw = np.repeat(ang_w[None, :, :], gh, axis=0)
    ang = np.concatenate([ah, aw], axis=-1).reshape(gh * gw, head_dim // 2)
    ang = np.concatenate([ang, ang], axis=-1)  # duplicate for rotate-half
    return np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)


def _rotate_half(x):
    d = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)


def apply_rope(x, sin, cos):
    """x: [B, N, H, D]; sin/cos: [N, D] shared, or [B, N, D] per-batch
    (the patch-dropout path gathers each element's kept positions)."""
    if sin.ndim == 2:
        sin = sin[None, :, None, :]
        cos = cos[None, :, None, :]
    else:
        sin = sin[:, :, None, :]
        cos = cos[:, :, None, :]
    sin = sin.astype(x.dtype)
    cos = cos.astype(x.dtype)
    return x * cos + _rotate_half(x) * sin


class SwiGLU(nn.Module):
    """SwiGLU MLP (reference ``eva/swiglu.py:13``). With ``use_norm`` this is
    the reference's scale_mlp=True SwiGLU (sub-LN before fc2); without it,
    it computes the same function as the reference's fused-fc1 GluMlp
    (``glumlp.py:94-112``, gate_last: ``x1 * swish(x2)`` — here
    ``fc1_x = x1``, ``fc1_g = x2``, so published fused fc1 kernels split
    column-wise onto (fc1_x, fc1_g))."""

    hidden_dim: int
    out_dim: int
    use_norm: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1_g")(x)
        b = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1_x")(x)
        h = nn.silu(a) * b
        if self.use_norm:
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(h)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(h)


class PatchDropout(nn.Module):
    """Train-time token dropout keeping prefix tokens
    (reference ``eva/patch_dropout.py:13``). With ``return_indices`` the
    kept spatial positions (sorted, per batch element — the reference's
    ``ordered=True``) come back so callers can gather per-token RoPE
    tables and scatter outputs back onto the full grid."""

    rate: float = 0.0
    num_prefix_tokens: int = 1
    return_indices: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate <= 0.0:
            return (x, None) if self.return_indices else x
        n, l, c = x.shape
        p = self.num_prefix_tokens
        num_keep = max(1, int((l - p) * (1.0 - self.rate)))
        rng = self.make_rng("dropout")
        noise = jax.random.uniform(rng, (n, l - p))
        keep_idx = jnp.argsort(noise, axis=-1)[:, :num_keep]
        keep_idx = jnp.sort(keep_idx, axis=-1)  # ordered=True parity
        tokens = jnp.take_along_axis(x[:, p:], keep_idx[..., None], axis=1)
        out = jnp.concatenate([x[:, :p], tokens], axis=1)
        return (out, keep_idx) if self.return_indices else out


class EvaBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4 * 2 / 3  # SwiGLU convention
    # reference block.py:100-117: scale_mlp=True -> SwiGLU with sub-LN
    # (large variants); False -> GluMlp, no sub-LN (tiny/small)
    scale_mlp: bool = True
    drop_path: float = 0.0
    num_prefix_tokens: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, sin, cos, train: bool = False):
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        p = self.num_prefix_tokens

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        # EVA uses q/v biases, no k bias
        q = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="q_proj")(h)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="k_proj")(h)
        v = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="v_proj")(h)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)

        # RoPE on spatial tokens only. The tables arrive with identity
        # rows (sin=0, cos=1) prepended for the prefix tokens — rotation
        # by zero is the identity — so ALL tokens rotate in one op with
        # no concat seams (probe_eva.py: the per-q/k concat costs 4x the
        # rotation itself).
        del p
        q = apply_rope(q, sin, cos)
        k = apply_rope(k, sin, cos)

        # Attention with the T^2 tensors kept in the model's compute
        # dtype. In bf16 this halves the dominant HBM traffic — the
        # materializing logits/probs round-trips — for 1.51x on the
        # attention unit at EVA02-L 512^2 geometry (tools/probe_eva.py:
        # 3.26 -> 2.16 ms fwd+bwd; flash at D=64 measures 7.9 ms; max
        # abs deviation 2.4e-4, the same as the flash kernel's own).
        # With dtype=None (f32 / parity), logits stay f32 — exact.
        logits_dtype = self.dtype or jnp.promote_types(q.dtype, jnp.float32)
        scale = jnp.asarray(1.0 / np.sqrt(head_dim), logits_dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=logits_dtype)
        probs = jax.nn.softmax(
            (logits * scale).astype(jnp.float32), axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        attn = attn.reshape(b, n, self.dim)
        attn = nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(attn)
        x = x + DropPath(self.drop_path, name="dp1")(attn, deterministic=not train)

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        h = SwiGLU(hidden_dim=int(self.dim * self.mlp_ratio), out_dim=self.dim,
                   use_norm=self.scale_mlp,
                   dtype=self.dtype, param_dtype=self.param_dtype, name="mlp")(h)
        return x + DropPath(self.drop_path, name="dp2")(h, deterministic=not train)


class Eva(nn.Module):
    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    drop_path_rate: float = 0.0
    patch_dropout_rate: float = 0.0
    pos_dropout_rate: float = 0.0  # reference eva.py:172-174,249
    scale_mlp: bool = True  # False = GluMlp (tiny/small), reference eva.py:458
    pretrain_grid: int = 16
    return_endpoints: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    # layerwise LR decay hook (reference eva.py:254): name pattern for
    # iseg_tpu.core.optimizer.layerwise_decay_multipliers
    layer_name_pattern = r"block(\d+)"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from iseg_tpu.ops.resize import resample_abs_pos_embed

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

        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pretrain_grid * self.pretrain_grid + 1, self.dim),
            self.param_dtype,
        )
        pos = resample_abs_pos_embed(
            pos_embed, (gh, gw), (self.pretrain_grid, self.pretrain_grid),
            num_prefix_tokens=1,
        )
        patch_embedding = x.reshape(n, gh, gw, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros_init(),
                         (1, 1, self.dim), self.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.dim)), x], axis=1)
        x = x + pos.astype(x.dtype)
        if self.pos_dropout_rate > 0.0:
            x = nn.Dropout(self.pos_dropout_rate, name="pos_dropout")(
                x, deterministic=not train)

        head_dim = self.dim // self.num_heads
        sin, cos = build_rope_2d(gh, gw, head_dim)
        sin, cos = jnp.asarray(sin), jnp.asarray(cos)
        ident_s = jnp.zeros((1, head_dim), sin.dtype)
        ident_c = jnp.ones((1, head_dim), cos.dtype)

        # Patch dropout (reference eva/patch_dropout.py:13, an orphan module
        # there; usable here): drop spatial tokens, gather each element's
        # RoPE rows for its kept positions, and scatter block outputs back
        # onto the full grid (zeros at dropped positions) so spatial
        # endpoints keep their static shape.
        keep_idx = None
        if self.patch_dropout_rate > 0.0 and train:
            x, keep_idx = PatchDropout(
                self.patch_dropout_rate, num_prefix_tokens=1,
                return_indices=True, name="patch_dropout")(x, train=train)
        # Prepend identity rows (sin=0, cos=1) for the cls token so blocks
        # rotate every token in one op (see EvaBlock).
        if keep_idx is not None:
            sin = jnp.take(sin, keep_idx, axis=0)  # [B, nk, D]
            cos = jnp.take(cos, keep_idx, axis=0)
            bsz = sin.shape[0]
            sin = jnp.concatenate(
                [jnp.broadcast_to(ident_s[None], (bsz, 1, head_dim)), sin],
                axis=1)
            cos = jnp.concatenate(
                [jnp.broadcast_to(ident_c[None], (bsz, 1, head_dim)), cos],
                axis=1)
        else:
            sin = jnp.concatenate([ident_s, sin], axis=0)
            cos = jnp.concatenate([ident_c, cos], axis=0)

        def to_spatial(tokens):
            """[B, nk(+drop), C] spatial tokens -> [B, gh, gw, C]."""
            if keep_idx is None:
                return tokens.reshape(n, gh, gw, self.dim)
            full = jnp.zeros((n, gh * gw, self.dim), tokens.dtype)
            full = jax.vmap(lambda f, i, t: f.at[i].set(t))(
                full, keep_idx, tokens)
            return full.reshape(n, gh, gw, self.dim)

        endpoints = []
        for i in range(self.depth):
            x = EvaBlock(
                dim=self.dim, num_heads=self.num_heads,
                scale_mlp=self.scale_mlp,
                drop_path=self.drop_path_rate * i / max(1, self.depth - 1),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block{i}",
            )(x, sin, cos, train=train)
            if self.return_endpoints:
                endpoints.append(to_spatial(x[:, 1:]))

        # Reference endpoint semantics (eva.py:301-313):
        # [class_token, patch_embedding, *per-block spatial]. No final
        # LayerNorm exists in the reference Eva.
        if self.return_endpoints:
            class_token = x[:, :1, :]
            return [class_token, patch_embedding] + endpoints
        return to_spatial(x[:, 1:])


_VARIANTS = {
    # name: (patch, dim, depth, heads, pretrain_grid, scale_mlp)
    # scale_mlp False = fused-fc1 GluMlp without sub-LN (reference
    # eva.py:446-458 tiny; large constructors :319-431 use scale_mlp=True)
    "eva02_tiny": (14, 192, 12, 3, 24, False),
    "eva02_small": (14, 384, 12, 6, 24, False),
    "eva02_base": (14, 768, 12, 12, 16, True),
    "eva02_large": (14, 1024, 24, 16, 16, True),
    # reference vocabulary (static_strings EVA02_*): named by patch size and
    # pretrain resolution
    "eva02_tiny_patch14_336": (14, 192, 12, 3, 24, False),
    "eva02_large_patch14_224": (14, 1024, 24, 16, 16, True),
    "eva02_large_patch16_224": (16, 1024, 24, 16, 14, True),
    "eva02_large_patch16_512_coco": (16, 1024, 24, 16, 32, True),
    "eva02_large_patch16_512_mv": (16, 1024, 24, 16, 32, True),
}


def _make_ctor(name, patch, dim, depth, heads, grid, scale_mlp):
    def ctor(output_stride=16, return_endpoints=True, **kwargs):
        del output_stride
        return Eva(patch_size=patch, dim=dim, depth=depth, num_heads=heads,
                   pretrain_grid=grid, scale_mlp=scale_mlp,
                   return_endpoints=return_endpoints, **kwargs)

    ctor.__name__ = name
    return ctor


for _name, (_p, _dim, _depth, _heads, _grid, _sm) in _VARIANTS.items():
    register_backbone(
        _name, _make_ctor(_name, _p, _dim, _depth, _heads, _grid, _sm))
