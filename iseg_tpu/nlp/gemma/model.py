"""Gemma backbone: embedding, decoder blocks (RoPE + GQA attention, GeGLU
FFN, RMSNorm), final norm.

Parity with the reference ``nlp/gemma/``: ``gemma_backbone.py:33``
(backbone), ``gemma_decoder_block.py:29`` (block + causal mask :114),
``gemma_attention.py:24`` (attention with RoPE :96 and KV cache :116-151),
``rms_normalization.py:19``.

TPU-first: the full-sequence (no-cache) path uses XLA's fused
``jax.nn.dot_product_attention`` at T >= ``DPA_MIN_SEQLEN`` — native GQA
(K/V stay at kv_heads, no repeat) and no materialized [B, H, T, T] f32
logits; measured 20-25% faster fwd+bwd than the einsum chain at 2B/7B
T=4096 geometry, while the einsum chain stays ahead below ~2k tokens
(BENCH_NOTES round 3, ``tools/probe_gemma_attention.py``). The decode
path uses explicit einsums against the cache (cache layout
[B, L, 2, max_len, kv_heads, head_dim] sliced per layer).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from iseg_tpu.nlp.gemma.config import GemmaConfig
from iseg_tpu.ops.quant import QuantDense, QuantEmbed
from iseg_tpu.parallel.constrain import constrain as _constrain

# Static (trace-time) sequence-length threshold above which the no-cache
# attention path switches from the einsum chain to XLA's fused
# ``jax.nn.dot_product_attention``. Crossover measured on TPU v5e
# (tools/probe_gemma_attention.py): einsum wins ~10% at T=1024, dpa wins
# 20-25% at T=4096. Tests pin this to exercise both paths.
DPA_MIN_SEQLEN = 2048


class RMSNorm(nn.Module):
    epsilon: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.zeros_init(),
                           (x.shape[-1],), self.param_dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.epsilon)
        # gemma convention: (1 + scale)
        return (xf * (1.0 + scale.astype(jnp.float32))).astype(x.dtype)


def apply_rope_1d(x: jax.Array, positions: jax.Array,
                  max_wavelength: float = 10000.0) -> jax.Array:
    """RoPE over sequence positions. x: [B, T, H, D], positions: [B, T]."""
    d = x.shape[-1]
    half = d // 2
    freq = jnp.exp(
        -jnp.log(max_wavelength) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = positions[..., None].astype(jnp.float32) * freq  # [B, T, half]
    sin = jnp.sin(ang)[:, :, None, :]
    cos = jnp.cos(ang)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


class GemmaAttention(nn.Module):
    """GQA attention with RoPE + optional KV cache
    (reference ``gemma_attention.py:24``).

    ``seq_axis`` (with ``data_axis``) enables sequence parallelism for
    full-sequence forwards (training / scoring): activations arrive
    sequence-sharded, q keeps the sequence sharding, and k/v are
    constrained replicated-over-sequence so GSPMD inserts ONE all-gather
    per layer for the attention context — the standard allgather-KV
    context-parallel formulation (a TPU-native addition; the reference
    has no SP, SURVEY.md §2.2).

    ``sp_mode="ring"`` swaps the context path for blockwise ring
    attention (``parallel/ring.py``): K/V blocks rotate over ``seq_axis``
    with ``ppermute`` while each device accumulates online-softmax stats
    for its query shard — O(T/N) resident context and no [T_local, T]
    score matrix, the long-context formulation. Numerically matches the
    allgather path; decode (``cache`` set) is unaffected."""

    config: GemmaConfig
    dtype: Any = None
    param_dtype: Any = jnp.float32
    seq_axis: Any = None
    data_axis: Any = None
    sp_mode: str = "allgather"
    layer_index: int = 0

    @nn.compact
    def __call__(self, x, positions, mask=None, cache=None, cache_index=None,
                 context=None, cache_offset=0):
        cfg = self.config
        b, t, _ = x.shape
        h, kvh, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        q = QuantDense((h, d), axis=-1, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="query")(x)
        k = QuantDense((kvh, d), axis=-1, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="key")(x)
        v = QuantDense((kvh, d), axis=-1, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="value")(x)

        q = apply_rope_1d(q, positions, cfg.rope_max_wavelength)
        k = apply_rope_1d(k, positions, cfg.rope_max_wavelength)
        q = q * (d ** -0.5)


        ring = (
            self.seq_axis is not None and cache is None
            and self.sp_mode == "ring"
            and not jax.sharding.get_abstract_mesh().empty
        )
        if ring:
            if mask is not None:
                raise ValueError(
                    "sp_mode='ring' derives its causal mask from "
                    "positions; pass mask=None (custom masks need "
                    "sp_mode='allgather')"
                )
            from iseg_tpu.parallel.ring import ring_attention

            q = _constrain(q, self.data_axis, self.seq_axis, None, None)
            k = _constrain(k, self.data_axis, self.seq_axis, None, None)
            v = _constrain(v, self.data_axis, self.seq_axis, None, None)
            # GQA K/V stay at kvh heads: the ring rotates the small
            # blocks and broadcasts to query heads on-device; the shared
            # output projection below closes the branch
            out = ring_attention(
                q, k, v, positions, self.seq_axis,
                batch_axis=self.data_axis, causal=True,
            )
        new_cache = None
        if context:
            # context-segment decode (VERDICT r3 #6): read-only cache
            # segments + a small active cache — see _context_decode
            out, new_cache = self._context_decode(
                q, k, v, positions, cache, cache_index, context, cache_offset)
        elif not ring:
            if self.seq_axis is not None and cache is None:
                # SP: queries stay sequence-sharded; keys/values gather
                # the full sequence (each device attends its query shard
                # against the whole context)
                q = _constrain(q, self.data_axis, self.seq_axis, None, None)
                k = _constrain(k, self.data_axis, None, None, None)
                v = _constrain(v, self.data_axis, None, None, None)

            if cache is not None:
                # cache: the FULL stack [B, L, 2, max_len, kvh, d]. Write
                # this layer's current k/v at cache_index by in-place
                # dynamic_update_slice into the big array (layer_index and
                # the k/v slot are static). Never slice-out + restack: the
                # restacked form copied the whole cache twice per decode
                # step — measured on TPU v5e: bf16 decode 67->78% of the
                # HBM roofline (+17% tok/s), w8a8 57->85% (+50%)
                # (BENCH_NOTES round 3).
                li = self.layer_index
                new_cache = jax.lax.dynamic_update_slice(
                    cache, k.astype(cache.dtype)[:, None, None],
                    (0, li, 0, cache_index, 0, 0))
                new_cache = jax.lax.dynamic_update_slice(
                    new_cache, v.astype(cache.dtype)[:, None, None],
                    (0, li, 1, cache_index, 0, 0))
                # attend over this layer's full cache row (static slices)
                k = new_cache[:, li, 0]
                v = new_cache[:, li, 1]

            if q.shape[1] >= DPA_MIN_SEQLEN:
                # XLA fused attention: native GQA (no kv repeat), no
                # materialized [B, H, T, S] f32 logits. q is pre-scaled.
                # Also taken by a long PREFILL into a KV cache (q_len = P,
                # kv = the updated cache; the position-aware mask hides
                # the unwritten tail) — at P=4096 the einsum path would
                # transiently materialize [B, H, P, max_len] f32 logits.
                out = jax.nn.dot_product_attention(
                    q, k.astype(q.dtype), v.astype(q.dtype),
                    mask=mask, scale=1.0)
            else:
                # grouped-query einsums: q reshaped [B, T, kvh, g, d] and
                # contracted against UNREPEATED k/v — decode is
                # KV-bandwidth-bound, and repeating the cache to h heads
                # would multiply its reads by h/kvh
                g = h // kvh
                tq = q.shape[1]
                qg = q.reshape(b, tq, kvh, g, d)
                logits = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                                    preferred_element_type=jnp.float32)
                if mask is not None:
                    # mask [B, 1, T, S] -> broadcast over (kvh, g)
                    logits = jnp.where(mask[:, :, None], logits,
                                       jnp.float32(-1e9))
                probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
                out = jnp.einsum("bkgts,bskd->btkgd", probs, v)
                out = out.reshape(b, tq, h, d)
        out = QuantDense(cfg.hidden_dim, axis=(-2, -1), use_bias=False,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="attention_output")(out)
        return out, new_cache

    def _context_decode(self, q, k, v, positions, cache, cache_index,
                        context, cache_offset):
        """Single-token decode against segmented KV storage
        (VERDICT r3 #6 — the beam/contrastive cache-reorder fix).

        ``context`` is a tuple of ``(segment, offset)`` pairs: read-only
        stacked caches ``[B', L, 2, S_j, kvh, d]`` whose slot ``s`` holds
        position ``offset + s``. A segment with ``B' < B`` is SHARED
        across ``B // B'`` consecutive query rows (beams of one sample
        share their prompt; contrastive candidates share their whole
        history) — it is read once per SAMPLE, not once per beam, which
        is where the bandwidth win over the monolithic cache comes from.
        Context slots are masked STRICTLY below the query position; the
        query's own k/v lives in the active ``cache`` (``[B, L, 2, S_a,
        kvh, d]``, positions ``cache_offset + s``), written in place at
        ``cache_index - cache_offset`` and masked ``<= position`` —
        together the attended set is exactly the monolithic path's.

        Softmax runs in fp32 over the concatenated per-segment logits, so
        logits match the monolithic einsum bit-for-bit; only the output
        accumulation order differs (per-segment partial sums in fp32)."""
        cfg = self.config
        b, t = q.shape[0], q.shape[1]
        h, kvh, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        g = h // kvh
        if t != 1:
            raise ValueError(
                f"context-segment decode is single-token (got T={t}); "
                "prefills run through the monolithic cache path")
        li = self.layer_index

        # write this step's k/v into the active cache (in-place DUS)
        local = cache_index - cache_offset
        new_cache = jax.lax.dynamic_update_slice(
            cache, k.astype(cache.dtype)[:, None, None],
            (0, li, 0, local, 0, 0))
        new_cache = jax.lax.dynamic_update_slice(
            new_cache, v.astype(cache.dtype)[:, None, None],
            (0, li, 1, local, 0, 0))
        k_act = new_cache[:, li, 0]  # [B, S_a, kvh, d]
        v_act = new_cache[:, li, 1]

        qq = q[:, 0].reshape(b, kvh, g, d)
        pos_q = positions[:, 0]  # [B]

        logit_parts = []  # each [b, kvh, g, S_j] fp32, masked
        value_parts = []  # (probs_slice -> out) closures' inputs
        for seg, off in context:
            ks = seg[:, li, 0]
            vs = seg[:, li, 1]
            bp, sj = ks.shape[0], ks.shape[1]
            grp = b // bp
            qr = qq.reshape(bp, grp, kvh, g, d)
            lg = jnp.einsum("bGkgd,bskd->bGkgs", qr, ks,
                            preferred_element_type=jnp.float32)
            kv_pos = off + jnp.arange(sj)
            m = kv_pos[None, None] < pos_q.reshape(bp, grp)[..., None]
            lg = jnp.where(m[:, :, None, None], lg, jnp.float32(-1e9))
            logit_parts.append(lg.reshape(b, kvh, g, sj))
            value_parts.append((vs, bp, grp))

        lga = jnp.einsum("bkgd,bskd->bkgs", qq, k_act,
                         preferred_element_type=jnp.float32)
        sa = k_act.shape[1]
        kv_pos_a = cache_offset + jnp.arange(sa)
        ma = kv_pos_a[None] <= pos_q[:, None]  # [b, S_a]
        lga = jnp.where(ma[:, None, None], lga, jnp.float32(-1e9))
        logit_parts.append(lga)

        probs = jax.nn.softmax(
            jnp.concatenate(logit_parts, axis=-1), axis=-1)
        out = None
        s0 = 0
        for (vs, bp, grp) in value_parts:
            sj = vs.shape[1]
            pj = probs[..., s0:s0 + sj].astype(vs.dtype)
            oj = jnp.einsum("bGkgs,bskd->bGkgd",
                            pj.reshape(bp, grp, kvh, g, sj), vs,
                            preferred_element_type=jnp.float32)
            oj = oj.reshape(b, kvh, g, d)
            out = oj if out is None else out + oj
            s0 += sj
        pa = probs[..., s0:].astype(v_act.dtype)
        oa = jnp.einsum("bkgs,bskd->bkgd", pa, v_act,
                        preferred_element_type=jnp.float32)
        out = oa if out is None else out + oa
        out = out.reshape(b, 1, h, d).astype(q.dtype)
        return out, new_cache


class GemmaDecoderBlock(nn.Module):
    """Pre-norm attention + pre-norm GeGLU FFN
    (reference ``gemma_decoder_block.py:29``)."""

    config: GemmaConfig
    dtype: Any = None
    param_dtype: Any = jnp.float32
    seq_axis: Any = None
    data_axis: Any = None
    sp_mode: str = "allgather"
    layer_index: int = 0

    @nn.compact
    def __call__(self, x, positions, mask=None, cache=None, cache_index=None,
                 context=None, cache_offset=0):
        cfg = self.config
        h = RMSNorm(epsilon=cfg.layer_norm_epsilon,
                    param_dtype=self.param_dtype, name="pre_attention_norm")(x)
        attn, new_cache = GemmaAttention(
            config=cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            seq_axis=self.seq_axis, data_axis=self.data_axis,
            sp_mode=self.sp_mode, layer_index=self.layer_index,
            name="attention",
        )(h, positions, mask=mask, cache=cache, cache_index=cache_index,
          context=context, cache_offset=cache_offset)
        x = x + attn
        if self.seq_axis is not None and cache is None:
            # back to sequence-sharded for the (pointwise) FFN
            x = _constrain(x, self.data_axis, self.seq_axis, None)

        h = RMSNorm(epsilon=cfg.layer_norm_epsilon,
                    param_dtype=self.param_dtype, name="pre_ffw_norm")(x)
        gate = QuantDense(cfg.intermediate_dim, use_bias=False,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="gating_ffw")(h)
        up = QuantDense(cfg.intermediate_dim, use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="gating_ffw_2")(h)
        ffw = nn.gelu(gate, approximate=True) * up
        ffw = QuantDense(cfg.hidden_dim, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ffw_linear")(ffw)
        return x + ffw, new_cache


def causal_mask(t: int, positions: jax.Array,
                kv_len: Optional[int] = None) -> jax.Array:
    """[B, 1, T, S] boolean causal mask (reference
    ``gemma_decoder_block.py:114``)."""
    if kv_len is None:
        kv_len = t
    kv_pos = jnp.arange(kv_len)[None, None, None, :]
    q_pos = positions[:, None, :, None]
    return kv_pos <= q_pos


class GemmaBackbone(nn.Module):
    """Embedding -> blocks -> final norm (reference ``gemma_backbone.py:33``).
    Logits come from the tied embedding (``reverse_embeddings``)."""

    config: GemmaConfig
    dtype: Any = None
    param_dtype: Any = jnp.float32
    # sequence parallelism (training/scoring forwards): shard activations'
    # sequence dim over this mesh axis; run under jax.set_mesh.
    # sp_mode: "allgather" (gather full K/V per layer) or "ring"
    # (blockwise ppermute context rotation, parallel/ring.py)
    seq_axis: Any = None
    data_axis: Any = None
    sp_mode: str = "allgather"

    def setup(self):
        cfg = self.config
        self.token_embedding = QuantEmbed(
            cfg.vocab_size, cfg.hidden_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="token_embedding",
        )
        self.blocks = [
            GemmaDecoderBlock(config=cfg, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              seq_axis=self.seq_axis,
                              data_axis=self.data_axis,
                              sp_mode=self.sp_mode, layer_index=i,
                              name=f"layer_{i}")
            for i in range(cfg.num_layers)
        ]
        self.final_norm = RMSNorm(epsilon=cfg.layer_norm_epsilon,
                                  param_dtype=self.param_dtype,
                                  name="final_normalization")

    def __call__(self, token_ids, positions=None, mask=None,
                 caches=None, cache_index=None, context=None,
                 cache_offset=0):
        """token_ids [B, T] -> hidden [B, T, D] (+ updated caches).

        ``context``/``cache_offset`` (decode only): read-only KV
        segments attended alongside the active ``caches`` — see
        ``GemmaAttention._context_decode``."""
        cfg = self.config
        b, t = token_ids.shape
        if positions is None:
            if caches is not None:
                # defaulting to arange(t) against a cache would rotary-
                # encode the tokens at position 0.. and mask away the
                # whole cache — silently-garbage logits, so refuse
                raise ValueError(
                    "positions must be passed explicitly when decoding "
                    "against a KV cache (arange(t) would mis-position "
                    "the query tokens)"
                )
            positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        x = self.token_embedding(token_ids)
        x = x * jnp.asarray(cfg.hidden_dim ** 0.5, x.dtype)
        if self.seq_axis is not None and caches is None:
            x = _constrain(x, self.data_axis, self.seq_axis, None)

        # ring SP derives causal masking from positions inside the kernel;
        # the [B, 1, T, S] mask tensor is never built (when no mesh is in
        # context the ring path falls back to dense attention, which does
        # need the mask)
        ring_active = (
            self.seq_axis is not None and self.sp_mode == "ring"
            and caches is None
            and not jax.sharding.get_abstract_mesh().empty
        )
        if mask is None and not ring_active and not context:
            # context-segment decode builds per-segment masks from
            # positions inside the attention op
            kv_len = caches.shape[3] if caches is not None else t
            mask = causal_mask(t, positions, kv_len=kv_len)

        # the FULL cache array [B, L, 2, S, kvh, d] threads through the
        # blocks; each block dynamic-update-slices its own (static) layer
        # row in place — no per-layer slice-out/restack copies (those cost
        # two full-cache copies per decode step; BENCH_NOTES round 3)
        for block in self.blocks:
            x, new_cache = block(x, positions, mask=mask, cache=caches,
                                 cache_index=cache_index, context=context,
                                 cache_offset=cache_offset)
            if new_cache is not None:
                caches = new_cache
        x = self.final_norm(x)
        if caches is not None:
            return x, caches
        return x

    def logits(self, hidden):
        """Tied-embedding readout (int8-resident when the table is
        quantized — the [V, D] read dominates the logits matmul)."""
        return self.token_embedding.attend(hidden.astype(jnp.float32))
