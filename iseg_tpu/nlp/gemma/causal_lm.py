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
from iseg_tpu.ops.pallas.cache_gather import beam_cache_gather


@dataclasses.dataclass
class GemmaCausalLM:
    """Host-side wrapper pairing a GemmaBackbone with sampling drivers."""

    config: GemmaConfig
    dtype: Any = None
    param_dtype: Any = jnp.float32
    # sequence parallelism for the full-sequence forwards (__call__ /
    # score); decode ignores it (single-token steps have no seq to shard).
    # sp_mode: "allgather" or "ring" (parallel/ring.py)
    seq_axis: Any = None
    data_axis: Any = None
    sp_mode: str = "allgather"

    def __post_init__(self):
        self.backbone = GemmaBackbone(
            config=self.config, dtype=self.dtype,
            param_dtype=self.param_dtype,
            seq_axis=self.seq_axis, data_axis=self.data_axis,
            sp_mode=self.sp_mode,
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

    def call_with_cache(self, variables, token_ids, caches, cache_index,
                        positions, context=None, cache_offset=0):
        """One forward writing k/v at ``cache_index``; attends over the whole
        cache with position-aware masking (reference :186-226).
        ``context``/``cache_offset``: read-only KV segments attended
        alongside ``caches`` (``GemmaAttention._context_decode``)."""
        logits, new_caches, _ = self._forward_with_cache(
            variables, token_ids, caches, cache_index, positions,
            context=context, cache_offset=cache_offset)
        return logits, new_caches

    def _forward_with_cache(self, variables, token_ids, caches, cache_index,
                            positions, context=None, cache_offset=0):
        """``call_with_cache`` + the final hidden states (needed by the
        contrastive sampler's degeneration penalty)."""
        hidden, new_caches = self.backbone.apply(
            variables, token_ids, positions=positions,
            caches=caches, cache_index=cache_index,
            context=context, cache_offset=cache_offset,
        )
        logits = self.backbone.apply(variables, hidden,
                                     method=GemmaBackbone.logits)
        return logits, new_caches, hidden

    # -- generation -------------------------------------------------------
    def generate(
        self,
        variables,
        prompt_ids: jax.Array,  # [B, P] int32 (left-aligned, 0-padded)
        prompt_lengths: jax.Array,  # [B]
        max_length: int,
        temperature: float = 0.0,  # 0 = greedy (back-compat shorthand)
        top_k: Optional[int] = None,  # restrict sampling to the k best
        top_p: Optional[float] = None,  # nucleus sampling mass
        sampler=None,  # Sampler instance or name ("greedy"/"top_k"/...)
        rng: Optional[jax.Array] = None,
        end_token_id: Optional[int] = None,
        cache_policy: str = "segmented",  # "segmented" | "monolithic"
        segment_len: int = 256,  # beam: active-cache growth granularity
    ) -> jax.Array:
        """Returns [B, max_length] generated ids (prompt included).

        ``sampler`` is the pluggable seam (reference
        ``compile(sampler=...)`` accepting any keras-nlp sampler,
        ``gemma_causal.py:44-76``): a :mod:`samplers` instance or name.
        The temperature/top_k/top_p kwargs are shorthand that resolve to
        the matching sampler. ``BeamSampler`` routes to the beam-expanded
        program; everything else traces into the flat decode scan.

        Compiled end to end (reference ``generate_step`` :241-314): the
        whole prefill + scan-decode body is jitted, cached per sampling
        config — calling it eagerly would pay per-op dispatch for the
        prefill, which dominates on high-latency links."""
        from iseg_tpu.nlp.gemma import samplers as S

        if sampler is None:
            if top_p is not None:
                sampler = S.TopPSampler(
                    p=top_p, k=top_k,
                    temperature=temperature if temperature > 0 else 1.0)
            elif temperature == 0.0:
                sampler = S.GreedySampler()
            elif top_k is not None:
                sampler = S.TopKSampler(k=top_k, temperature=temperature)
            else:
                sampler = S.RandomSampler(temperature=temperature)
        elif isinstance(sampler, str):
            # a named sampler picks up the matching shorthand kwargs
            # (silently dropping them would sample the wrong distribution)
            defaults: dict = {}
            if sampler in ("top_k", "top_p", "random") and temperature > 0:
                defaults["temperature"] = temperature
            if sampler == "top_k" and top_k is not None:
                defaults["k"] = top_k
            if sampler == "top_p":
                if top_p is not None:
                    defaults["p"] = top_p
                if top_k is not None:
                    defaults["k"] = top_k
            sampler = S.get_sampler(sampler, **defaults)
        else:
            sampler = S.get_sampler(sampler)

        if rng is None:
            rng = jax.random.PRNGKey(0)

        # decode starts at the SHORTEST prompt's length, not the padded
        # buffer width: rows shorter than the buffer get their pad gap
        # [length, P) filled with generated tokens (keras-nlp reference
        # semantics); rows still inside their prompt re-forward the prompt
        # token (idempotent cache write) until generation reaches them.
        # Host-static so the scan trip count stays static; distinct start
        # values retrace, like any shape change.
        import numpy as np

        p_width = int(prompt_ids.shape[1])
        if isinstance(prompt_lengths, jax.core.Tracer):
            # under an OUTER jit the lengths are abstract: scan the whole
            # range (correct for any lengths; prompt steps re-forward
            # their own token, so only speed is lost)
            start = 1
        else:
            start = int(np.min(np.asarray(prompt_lengths)))
            start = max(1, min(start, p_width))

        key = (max_length, sampler, end_token_id, start, cache_policy,
               segment_len)
        fn = self._generate_jit.get(key)
        if fn is None:
            import functools

            kw: dict = {}
            if isinstance(sampler, S.BeamSampler):
                if cache_policy == "segmented":
                    impl = self._generate_beam_impl
                    kw["segment_len"] = segment_len
                else:
                    impl = self._generate_beam_monolithic
            elif isinstance(sampler, S.ContrastiveSampler):
                impl = self._generate_contrastive_impl
                kw["shared_context"] = cache_policy == "segmented"
            else:
                impl = self._generate_impl
            fn = jax.jit(functools.partial(
                impl, max_length=max_length, sampler=sampler,
                end_token_id=end_token_id, start=start, **kw))
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
        sampler,
        end_token_id: Optional[int],
        start: Optional[int] = None,
    ) -> jax.Array:
        b, p = prompt_ids.shape
        if start is None:
            start = p
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

        done0 = jnp.zeros((b,), bool)

        def step(carry, i):
            tokens, caches, next_logits, key, done = carry
            key, sub = jax.random.split(key)
            new_tok = sampler.sample(next_logits, sub)
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
        (tokens, *_), _ = jax.lax.scan(step, init, jnp.arange(start, max_length))
        return tokens

    def _generate_beam_impl(
        self,
        variables,
        prompt_ids: jax.Array,
        prompt_lengths: jax.Array,
        rng: jax.Array,
        *,
        max_length: int,
        sampler,  # samplers.BeamSampler
        end_token_id: Optional[int],
        start: Optional[int] = None,
        segment_len: int = 256,
    ) -> jax.Array:
        """Beam search with segmented KV storage (VERDICT r3 #6).

        Same sampling semantics as ``_generate_beam_monolithic`` (one
        prefill + scan program, per-step parent reordering), but the
        cache is split TPU-first to kill the reorder's HBM traffic —
        measured 1.18 ms/step at the bench geometry, 48% of each beam4
        step (tools/probe_beam_gather.py):

        - the prompt slots ``[0, start)`` are IDENTICAL across beams
          (they come from one shared prefill), so they live in a
          read-only [B]-row context segment: never reordered, and read
          once per sample instead of once per beam;
        - generated slots live in an ACTIVE cache that starts
          ``segment_len`` wide and grows by Python-unrolled segments
          (static shapes per segment scan), so each step's parent-gather
          copies only the slots written so far, not ``max_length``.

        Token output is semantically identical to the monolithic path
        (same logits bit-for-bit; output partial-sum order differs at
        fp32 — ``tests/test_gemma_samplers.py`` asserts token equality).
        """
        nb = sampler.num_beams
        b, p = prompt_ids.shape
        if start is None:
            start = p
        neg_inf = jnp.float32(-1e9)

        # prefill at B rows into a width-p cache (slots [0, p))
        caches_p = self.build_cache(b, p)
        positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
        logits, caches_p = self.call_with_cache(
            self._dense_variables(variables, barrier=False),
            prompt_ids, caches_p, 0, positions,
        )
        # shared read-only prompt segment [B, L, 2, start, kvh, d]
        prompt_ctx = caches_p[:, :, :, :start]
        context = ((prompt_ctx, 0),)
        # prompt tail [start, p): per-beam (ragged prompts re-forward and
        # OVERWRITE these slots during decode, so they must be active)
        tail = caches_p[:, :, :, start:]

        last_idx = jnp.clip(prompt_lengths - 1, 0, p - 1)
        next_logits = jnp.take_along_axis(
            logits, last_idx[:, None, None], axis=1
        )[:, 0]  # [B, V]
        vocab = next_logits.shape[-1]
        next_logits = jnp.repeat(next_logits, nb, axis=0)  # [B*nb, V]

        tokens = jnp.zeros((b, nb, max_length), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.broadcast_to(prompt_ids[:, None], (b, nb, p)),
            (0, 0, 0),
        )
        scores = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((nb - 1,), neg_inf)])
            [None], (b, 1),
        )
        done = jnp.zeros((b, nb), bool)

        # active-cache segment boundaries: the first segment must hold
        # the whole prompt tail; later ones grow by segment_len
        ends = []
        e = max(start + segment_len, p)
        while e < max_length:
            ends.append(e)
            e += segment_len
        ends.append(max_length)

        cdtype = caches_p.dtype
        cfg = self.config
        active = jnp.zeros(
            (b * nb, cfg.num_layers, 2, ends[0] - start,
             cfg.num_kv_heads, cfg.head_dim), cdtype)
        if p > start:
            active = jax.lax.dynamic_update_slice(
                active, jnp.repeat(tail, nb, axis=0), (0, 0, 0, 0, 0, 0))

        def step(carry, i):
            tokens, active, next_logits, scores, done = carry
            log_probs = jax.nn.log_softmax(
                next_logits.astype(jnp.float32), axis=-1
            ).reshape(b, nb, vocab)
            pad_row = jnp.full((vocab,), neg_inf).at[0].set(0.0)
            log_probs = jnp.where(done[..., None], pad_row, log_probs)
            forced = i < prompt_lengths  # [B]
            cur = jax.lax.dynamic_slice(
                tokens, (0, 0, i), (b, nb, 1))[..., 0]  # [B, nb]
            forced_row = jnp.where(
                jax.nn.one_hot(cur, vocab, dtype=bool), 0.0, neg_inf)
            log_probs = jnp.where(forced[:, None, None], forced_row, log_probs)

            total = (scores[..., None] + log_probs).reshape(b, nb * vocab)
            new_scores, flat_idx = jax.lax.top_k(total, nb)  # [B, nb]
            parent = flat_idx // vocab
            tok = (flat_idx % vocab).astype(jnp.int32)

            done2 = jnp.take_along_axis(done, parent, axis=1)
            if end_token_id is not None:
                done2 = done2 | (~forced[:, None] & (tok == end_token_id))

            tokens2 = jnp.take_along_axis(tokens, parent[..., None], axis=1)
            tokens2 = jax.lax.dynamic_update_slice(
                tokens2, tok[..., None], (0, 0, i)
            )
            # reorder ONLY the written generated slots by parent beam —
            # the shared prompt segment never moves. The reorder is a
            # whole-slab row permutation routed through
            # ops/pallas/cache_gather.py: the XLA vmap gather by default
            # (measured fastest end-to-end on v5e), the Pallas slab-copy
            # kernel behind ISEG_CACHE_GATHER=pallas.
            act_bnb = active.reshape(b, nb, *active.shape[1:])
            act2 = beam_cache_gather(act_bnb, parent)
            act2 = act2.reshape(b * nb, *active.shape[1:])

            positions_i = jnp.full((b * nb, 1), i, jnp.int32)
            logits_i, act3 = self.call_with_cache(
                self._dense_variables(variables, barrier=True),
                tok.reshape(b * nb, 1), act2, i, positions_i,
                context=context, cache_offset=start,
            )
            return (tokens2, act3, logits_i[:, 0], new_scores, done2), None

        prev = start
        for end in ends:
            width = end - start
            if active.shape[3] < width:
                grown = jnp.zeros(
                    (b * nb, cfg.num_layers, 2, width,
                     cfg.num_kv_heads, cfg.head_dim), cdtype)
                active = jax.lax.dynamic_update_slice(
                    grown, active, (0, 0, 0, 0, 0, 0))
            carry = (tokens, active, next_logits, scores, done)
            (tokens, active, next_logits, scores, done), _ = jax.lax.scan(
                step, carry, jnp.arange(prev, end))
            prev = end

        best = jnp.argmax(scores, axis=1)
        return jnp.take_along_axis(
            tokens, best[:, None, None], axis=1
        )[:, 0]

    def _generate_beam_monolithic(
        self,
        variables,
        prompt_ids: jax.Array,
        prompt_lengths: jax.Array,
        rng: jax.Array,
        *,
        max_length: int,
        sampler,  # samplers.BeamSampler
        end_token_id: Optional[int],
        start: Optional[int] = None,
    ) -> jax.Array:
        """Beam search in the same one-program prefill+scan shape
        (reference compiles ``BeamSampler`` through the identical
        ``generate_step``, ``gemma_causal.py:70-76,283``).

        The batch is beam-expanded to ``B*nb`` rows after a B-row prefill;
        each scan step re-ranks (score + log-prob) over ``nb*V``
        continuations, gathers the KV caches by parent-beam index, and the
        best-scoring beam per sample is returned at the end. Finished beams
        continue with token 0 at log-prob 0 so their scores freeze. Rows
        whose prompt extends past the current step are FORCED to their
        prompt token at log-prob 0 (scores frozen), so ragged prompts
        stay on-prompt until their own length."""
        nb = sampler.num_beams
        b, p = prompt_ids.shape
        if start is None:
            start = p
        neg_inf = jnp.float32(-1e9)

        # prefill once on B rows, then tile rows nb times (row-major:
        # [b0,b0,...,b1,b1,...] matches a later [B, nb, ...] reshape)
        caches = self.build_cache(b, max_length)
        positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
        logits, caches = self.call_with_cache(
            self._dense_variables(variables, barrier=False),
            prompt_ids, caches, 0, positions,
        )
        caches = jnp.repeat(caches, nb, axis=0)  # [B*nb, L, 2, T, kv, hd]

        last_idx = jnp.clip(prompt_lengths - 1, 0, p - 1)
        next_logits = jnp.take_along_axis(
            logits, last_idx[:, None, None], axis=1
        )[:, 0]  # [B, V]
        vocab = next_logits.shape[-1]
        next_logits = jnp.repeat(next_logits, nb, axis=0)  # [B*nb, V]

        tokens = jnp.zeros((b, nb, max_length), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.broadcast_to(prompt_ids[:, None], (b, nb, p)),
            (0, 0, 0),
        )
        # beam 0 live, the rest dead so step 1 picks nb distinct tokens
        scores = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((nb - 1,), neg_inf)])
            [None], (b, 1),
        )
        done0 = jnp.zeros((b, nb), bool)

        def step(carry, i):
            tokens, caches, next_logits, scores, done = carry
            log_probs = jax.nn.log_softmax(
                next_logits.astype(jnp.float32), axis=-1
            ).reshape(b, nb, vocab)
            # finished beams: only token 0 at log-prob 0 (score frozen)
            pad_row = jnp.full((vocab,), neg_inf).at[0].set(0.0)
            log_probs = jnp.where(done[..., None], pad_row, log_probs)
            # rows still inside their prompt: only the prompt token, at
            # log-prob 0 — beams stay on-prompt with frozen scores
            forced = i < prompt_lengths  # [B]
            cur = jax.lax.dynamic_slice(
                tokens, (0, 0, i), (b, nb, 1))[..., 0]  # [B, nb]
            forced_row = jnp.where(
                jax.nn.one_hot(cur, vocab, dtype=bool), 0.0, neg_inf)
            log_probs = jnp.where(forced[:, None, None], forced_row, log_probs)

            total = (scores[..., None] + log_probs).reshape(b, nb * vocab)
            new_scores, flat_idx = jax.lax.top_k(total, nb)  # [B, nb]
            parent = flat_idx // vocab
            tok = (flat_idx % vocab).astype(jnp.int32)

            done2 = jnp.take_along_axis(done, parent, axis=1)
            if end_token_id is not None:
                # an end id INSIDE a prompt must not finish the beam
                done2 = done2 | (~forced[:, None] & (tok == end_token_id))

            # reorder histories and caches by parent beam
            tokens2 = jnp.take_along_axis(tokens, parent[..., None], axis=1)
            tokens2 = jax.lax.dynamic_update_slice(
                tokens2, tok[..., None], (0, 0, i)
            )
            caches_bnb = caches.reshape(b, nb, *caches.shape[1:])
            caches2 = jax.vmap(lambda c, idx: c[idx])(caches_bnb, parent)
            caches2 = caches2.reshape(b * nb, *caches.shape[1:])

            positions_i = jnp.full((b * nb, 1), i, jnp.int32)
            logits_i, caches3 = self.call_with_cache(
                self._dense_variables(variables, barrier=True),
                tok.reshape(b * nb, 1), caches2, i, positions_i,
            )
            return (tokens2, caches3, logits_i[:, 0], new_scores, done2), None

        init = (tokens, caches, next_logits, scores, done0)
        (tokens, _, _, scores, _), _ = jax.lax.scan(
            step, init, jnp.arange(start, max_length)
        )
        best = jnp.argmax(scores, axis=1)
        return jnp.take_along_axis(
            tokens, best[:, None, None], axis=1
        )[:, 0]

    def _generate_contrastive_impl(
        self,
        variables,
        prompt_ids: jax.Array,
        prompt_lengths: jax.Array,
        rng: jax.Array,
        *,
        max_length: int,
        sampler,  # samplers.ContrastiveSampler
        end_token_id: Optional[int],
        start: Optional[int] = None,
        shared_context: bool = True,
    ) -> jax.Array:
        """Contrastive search (keras-nlp ``ContrastiveSampler`` semantics):
        at each step the ``k`` most probable candidates each take one
        batched cache forward; the winner maximizes
        ``(1-alpha) * p - alpha * max cos-sim(h_cand, hidden history)``.
        One compiled prefill+scan program like every other sampler.

        ``shared_context=True`` (default; VERDICT r3 #6): candidates
        share their ENTIRE history — they differ only in the current
        token — so the candidate forward attends the [B]-row cache as a
        read-only context segment plus a per-candidate 1-slot active
        cache (its own k/v). This eliminates the per-step
        repeat-to-[B*k] + keep-winner-select of the full cache (the
        dominant HBM traffic: ~345 MB/step at the bench geometry) —
        only the winner's [B, L, 2, 1, kvh, d] slot slab is written
        back. ``False`` keeps the monolithic formulation."""
        del rng  # deterministic given the scores
        kc, alpha = sampler.k, sampler.alpha
        cfgc = self.config
        b, p = prompt_ids.shape
        if start is None:
            start = p
        caches = self.build_cache(b, max_length)
        dense = self._dense_variables(variables, barrier=False)

        positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
        logits, caches, hidden_p = self._forward_with_cache(
            dense, prompt_ids, caches, 0, positions)
        dim = hidden_p.shape[-1]

        # hidden-state history: prompt states fill [0, P) (padding rows
        # beyond each prompt_length are masked out of the penalty)
        history = jnp.zeros((b, max_length, dim), jnp.float32)
        history = jax.lax.dynamic_update_slice(
            history, hidden_p.astype(jnp.float32), (0, 0, 0))

        tokens = jnp.zeros((b, max_length), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids, (0, 0))

        last_idx = jnp.clip(prompt_lengths - 1, 0, p - 1)
        next_logits = jnp.take_along_axis(
            logits, last_idx[:, None, None], axis=1)[:, 0]

        done0 = jnp.zeros((b,), bool)

        def step(carry, i):
            tokens, caches, history, next_logits, done = carry
            probs = jax.nn.softmax(next_logits.astype(jnp.float32), axis=-1)
            cand_p, cand_ids = jax.lax.top_k(probs, kc)  # [B, k]

            # rows still inside their prompt: every candidate IS the
            # prompt token, so the kept cache/history row holds the prompt
            # token's k/v and hidden, not a speculated candidate's
            forced = i < prompt_lengths  # [B]
            cur0 = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))[:, 0]
            cand_ids = jnp.where(forced[:, None], cur0[:, None], cand_ids)

            # one batched forward for all candidates
            pos_i = jnp.full((b * kc, 1), i, jnp.int32)
            if shared_context:
                # candidates share the whole [B]-row history (read-only
                # context); each gets a private 1-slot active cache
                slot = jnp.zeros(
                    (b * kc, cfgc.num_layers, 2, 1,
                     cfgc.num_kv_heads, cfgc.head_dim), caches.dtype)
                logits_k, slot, hidden_k = self._forward_with_cache(
                    self._dense_variables(variables, barrier=True),
                    cand_ids.reshape(b * kc, 1), slot, i, pos_i,
                    context=((caches, 0),), cache_offset=i)
            else:
                # monolithic: B*k rows share the tiled cache; only the
                # winner's cache row is kept
                caches_k = jnp.repeat(caches, kc, axis=0)
                logits_k, caches_k, hidden_k = self._forward_with_cache(
                    self._dense_variables(variables, barrier=True),
                    cand_ids.reshape(b * kc, 1), caches_k, i, pos_i)
            h_cand = hidden_k[:, 0].reshape(b, kc, dim).astype(jnp.float32)

            # degeneration penalty: max cosine similarity against every
            # prior hidden state. All slots < i are real by construction:
            # prompt slots from the prefill, and each former pad slot in
            # [prompt_length, i) was overwritten with its generated
            # token's hidden when the sweep passed it.
            h_norm = h_cand / (jnp.linalg.norm(h_cand, axis=-1,
                                               keepdims=True) + 1e-8)
            hist_norm = history / (jnp.linalg.norm(history, axis=-1,
                                                   keepdims=True) + 1e-8)
            sim = jnp.einsum("bkd,btd->bkt", h_norm, hist_norm)
            pos = jnp.arange(max_length)[None]  # [1, T]
            valid = pos < i  # [1, T] broadcasting over B
            sim = jnp.where(valid[:, None], sim, -1.0)
            penalty = jnp.max(sim, axis=-1)  # [B, k]

            score = (1.0 - alpha) * cand_p - alpha * penalty
            best = jnp.argmax(score, axis=-1)  # [B]

            new_tok = jnp.take_along_axis(cand_ids, best[:, None], axis=1)[:, 0]
            in_gen = (i >= prompt_lengths) & (~done)
            cur = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))[:, 0]
            tok = jnp.where(in_gen, new_tok, cur)
            tokens2 = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, i))
            if end_token_id is not None:
                done = done | (in_gen & (tok == end_token_id))

            # keep the winning candidate's cache / hidden / logits
            if shared_context:
                # write only the winner's 1-slot k/v slab into the shared
                # cache at position i (in-place DUS on the carry)
                slab = slot.reshape(b, kc, *slot.shape[1:])
                win = jnp.take_along_axis(
                    slab, best.reshape(b, 1, *([1] * (slot.ndim - 1))),
                    axis=1)[:, 0]
                caches2 = jax.lax.dynamic_update_slice(
                    caches, win, (0, 0, 0, i, 0, 0))
            else:
                caches_bk = caches_k.reshape(b, kc, *caches.shape[1:])
                caches2 = jnp.take_along_axis(
                    caches_bk,
                    best.reshape(b, 1, *([1] * (caches.ndim - 1))), axis=1
                )[:, 0]
            h_best = jnp.take_along_axis(
                h_cand, best[:, None, None], axis=1)[:, 0]
            history2 = jax.lax.dynamic_update_slice(
                history, h_best[:, None], (0, i, 0))
            logits_bk = logits_k[:, 0].reshape(b, kc, -1)
            next_logits2 = jnp.take_along_axis(
                logits_bk, best[:, None, None], axis=1)[:, 0]
            return (tokens2, caches2, history2, next_logits2, done), None

        init = (tokens, caches, history, next_logits, done0)
        (tokens, *_), _ = jax.lax.scan(step, init, jnp.arange(start, max_length))
        return tokens

    def score(self, variables, token_ids):
        """Per-token log-likelihood of ``token_ids``
        (reference ``gemma_causal.py:316``)."""
        logits = self(variables, token_ids)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        target = token_ids[:, 1:]
        lp = jnp.take_along_axis(log_probs[:, :-1], target[..., None], axis=-1)
        return lp[..., 0]
