"""Gemma causal LM: cached generation + scoring.

Parity with the reference ``nlp/gemma/gemma_causal.py:33`` (``GemmaCausalLM``:
``call_with_cache`` :186-226, ``_build_cache`` :228-239, XLA-compilable
``generate_step`` sampler loop :241-314, ``score()`` :316).

TPU-first: prefill is one batched forward; decode is a ``lax.scan`` over
token slots (static trip count = max_length), each step a single-token
forward against the KV cache — one compiled program for the whole
generation, matching the reference's jit-compiled sampler loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from iseg_tpu.nlp.gemma.config import GemmaConfig
from iseg_tpu.nlp.gemma.model import GemmaBackbone, causal_mask


@dataclasses.dataclass
class GemmaCausalLM:
    """Host-side wrapper pairing a GemmaBackbone with sampling drivers."""

    config: GemmaConfig
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def __post_init__(self):
        self.backbone = GemmaBackbone(
            config=self.config, dtype=self.dtype, param_dtype=self.param_dtype
        )
        # jitted generate programs, keyed by sampling config (shape changes
        # retrace within each jit entry as usual)
        self._generate_jit: dict = {}

    # -- setup ------------------------------------------------------------
    def init(self, rng, batch=1, seq=8):
        return self.backbone.init(rng, jnp.zeros((batch, seq), jnp.int32))

    def build_cache(self, batch: int, max_length: int):
        """[B, layers, 2, max_len, kv_heads, head_dim]
        (reference ``gemma_causal.py:228-239``)."""
        cfg = self.config
        return jnp.zeros(
            (batch, cfg.num_layers, 2, max_length, cfg.num_kv_heads, cfg.head_dim),
            self.dtype or jnp.float32,
        )

    def _dense_variables(self, variables, barrier: bool):
        """Transparent int8 weight-only support (ops.quant): rebuild
        dense params when QTensor leaves are present, else pass through."""
        from iseg_tpu.ops.quant import dequantize_tree, is_quantized

        params = variables.get("params", variables)
        if not is_quantized(params):
            return variables
        dense = dequantize_tree(params, barrier=barrier,
                                dtype=self.dtype or jnp.bfloat16)
        if "params" in variables:
            return {**variables, "params": dense}
        return dense

    # -- forward ----------------------------------------------------------
    def __call__(self, variables, token_ids):
        variables = self._dense_variables(variables, barrier=False)
        hidden = self.backbone.apply(variables, token_ids)
        return self.backbone.apply(variables, hidden, method=GemmaBackbone.logits)

    def call_with_cache(self, variables, token_ids, caches, cache_index, positions):
        """One forward writing k/v at ``cache_index``; attends over the whole
        cache with position-aware masking (reference :186-226)."""
        hidden, new_caches = self.backbone.apply(
            variables, token_ids, positions=positions,
            caches=caches, cache_index=cache_index,
        )
        logits = self.backbone.apply(variables, hidden,
                                     method=GemmaBackbone.logits)
        return logits, new_caches

    # -- generation -------------------------------------------------------
    def generate(
        self,
        variables,
        prompt_ids: jax.Array,  # [B, P] int32 (left-aligned, 0-padded)
        prompt_lengths: jax.Array,  # [B]
        max_length: int,
        temperature: float = 0.0,  # 0 = greedy
        top_k: Optional[int] = None,  # restrict sampling to the k best
        rng: Optional[jax.Array] = None,
        end_token_id: Optional[int] = None,
    ) -> jax.Array:
        """Returns [B, max_length] generated ids (prompt included).

        Compiled end to end (reference ``generate_step`` :241-314): the
        whole prefill + scan-decode body is jitted, cached per sampling
        config — calling it eagerly would pay per-op dispatch for the
        prefill, which dominates on high-latency links."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        key = (max_length, temperature, top_k, end_token_id)
        fn = self._generate_jit.get(key)
        if fn is None:
            import functools

            fn = jax.jit(functools.partial(
                self._generate_impl, max_length=max_length,
                temperature=temperature, top_k=top_k,
                end_token_id=end_token_id))
            self._generate_jit[key] = fn
        return fn(variables, prompt_ids, prompt_lengths, rng)

    def _generate_impl(
        self,
        variables,
        prompt_ids: jax.Array,
        prompt_lengths: jax.Array,
        rng: jax.Array,
        *,
        max_length: int,
        temperature: float,
        top_k: Optional[int],
        end_token_id: Optional[int],
    ) -> jax.Array:
        b, p = prompt_ids.shape
        caches = self.build_cache(b, max_length)

        # int8 weight-only serving (ops.quant): dequantize lazily —
        # once for the prefill, and PER STEP behind an optimization
        # barrier inside the decode scan so the bf16 weights are never
        # materialized in HBM (decode reads int8, halving its bandwidth)
        qvariables = variables

        # prefill: run the whole prompt once, cache k/v at [0, P); the
        # position-aware causal mask hides the not-yet-written cache tail
        positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
        logits, caches = self.call_with_cache(
            self._dense_variables(qvariables, barrier=False),
            prompt_ids, caches, 0, positions
        )

        tokens = jnp.zeros((b, max_length), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))

        # last real prompt token's logits seed the first generated token
        last_idx = jnp.clip(prompt_lengths - 1, 0, p - 1)
        next_logits = jnp.take_along_axis(
            logits, last_idx[:, None, None], axis=1
        )[:, 0]

        def sample(logits, key):
            if temperature == 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            logits = logits / temperature
            if top_k is not None:
                vals, idx = jax.lax.top_k(logits, top_k)
                choice = jax.random.categorical(key, vals)
                return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0].astype(
                    jnp.int32
                )
            return jax.random.categorical(key, logits).astype(jnp.int32)

        done0 = jnp.zeros((b,), bool)

        def step(carry, i):
            tokens, caches, next_logits, key, done = carry
            key, sub = jax.random.split(key)
            new_tok = sample(next_logits, sub)
            # only write into positions >= the prompt length
            in_gen = (i >= prompt_lengths) & (~done)
            cur = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))[:, 0]
            tok = jnp.where(in_gen, new_tok, cur)
            tokens2 = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, i))
            if end_token_id is not None:
                done = done | (in_gen & (tok == end_token_id))

            # decode forward for position i (writes cache at i)
            positions_i = jnp.full((b, 1), i, jnp.int32)
            logits_i, caches2 = self.call_with_cache(
                self._dense_variables(qvariables, barrier=True),
                tok[:, None], caches, i, positions_i
            )
            return (tokens2, caches2, logits_i[:, 0], key, done), None

        init = (tokens, caches, next_logits, rng, done0)
        (tokens, *_), _ = jax.lax.scan(step, init, jnp.arange(p, max_length))
        return tokens

    def score(self, variables, token_ids):
        """Per-token log-likelihood of ``token_ids``
        (reference ``gemma_causal.py:316``)."""
        logits = self(variables, token_ids)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        target = token_ids[:, 1:]
        lp = jnp.take_along_axis(log_probs[:, :-1], target[..., None], axis=-1)
        return lp[..., 0]
