"""Pluggable sampling strategies for causal-LM generation.

Parity with the reference's "compile with any keras-nlp sampler" seam
(``nlp/gemma/gemma_causal.py:44-76``: ``compile(sampler="top_k")``,
``BeamSampler(num_beams=2)``, invocation :283). Samplers here are frozen
dataclasses — hashable, so each (sampler, max_length) pair compiles once
and is cached (the sampler's ``sample`` traces into the one
prefill+scan-decode program in ``causal_lm.py``).

Flat samplers implement ``sample(logits [B, V], key) -> tokens [B]`` and
drop into the decode scan unchanged. ``BeamSampler`` is structural — the
generate driver lowers it to a beam-expanded scan with per-step cache
reordering (see ``GemmaCausalLM._generate_beam_impl``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Sampler:
    """Base: subclasses override ``sample``."""

    def sample(self, logits: jax.Array, key: jax.Array) -> jax.Array:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class GreedySampler(Sampler):
    """argmax decoding (reference sampler name ``"greedy"``)."""

    def sample(self, logits, key):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _maybe_temperature(logits, temperature: float):
    if temperature == 1.0:
        return logits
    return logits / temperature


@dataclasses.dataclass(frozen=True)
class RandomSampler(Sampler):
    """Sample the full softmax (reference ``"random"``); temperature 0 is
    greedy."""

    temperature: float = 1.0

    def sample(self, logits, key):
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(
            key, _maybe_temperature(logits, self.temperature)
        ).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class TopKSampler(Sampler):
    """Sample among the k most probable tokens (reference ``"top_k"``)."""

    k: int = 5
    temperature: float = 1.0

    def sample(self, logits, key):
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        vals, idx = jax.lax.top_k(_maybe_temperature(logits, self.temperature),
                                  self.k)
        choice = jax.random.categorical(key, vals)
        return jnp.take_along_axis(
            idx, choice[:, None], axis=1
        )[:, 0].astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class TopPSampler(Sampler):
    """Nucleus sampling (reference ``"top_p"``): sample within the smallest
    set of tokens whose cumulative probability exceeds ``p``.

    ``k`` optionally pre-truncates to the k best before the cumulative
    filter (keras-nlp's efficiency knob) — sorting k values instead of the
    full vocab."""

    p: float = 0.9
    k: Optional[int] = None
    temperature: float = 1.0

    def sample(self, logits, key):
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits = _maybe_temperature(logits, self.temperature)
        k = self.k or logits.shape[-1]
        vals, idx = jax.lax.top_k(logits, k)  # descending
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative mass *before* them is < p (the first
        # token always survives; the one crossing p is included)
        keep = (cum - probs) < self.p
        vals = jnp.where(keep, vals, -jnp.inf)
        choice = jax.random.categorical(key, vals)
        return jnp.take_along_axis(
            idx, choice[:, None], axis=1
        )[:, 0].astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class ContrastiveSampler(Sampler):
    """Contrastive search (keras-nlp ``ContrastiveSampler``; the reference
    compiles it through the same ``compile(sampler=...)`` seam). Structural:
    the generate driver re-scores the ``k`` most probable candidates by
    ``(1 - alpha) * p(candidate) - alpha * max cosine-similarity`` against
    the hidden-state history (degeneration penalty), which takes one extra
    batched model step per decode step."""

    k: int = 5
    alpha: float = 0.6

    def sample(self, logits, key):  # pragma: no cover - driver intercepts
        raise TypeError(
            "ContrastiveSampler is handled by the generate driver"
        )


@dataclasses.dataclass(frozen=True)
class BeamSampler(Sampler):
    """Beam search (reference ``BeamSampler(num_beams=...)``). Structural:
    handled by ``GemmaCausalLM._generate_beam_impl`` (beam-expanded batch,
    per-step KV-cache reordering, best-beam selection at the end)."""

    num_beams: int = 2

    def sample(self, logits, key):  # pragma: no cover - driver intercepts
        raise TypeError(
            "BeamSampler is handled by the generate driver, not per-step"
        )


_NAMED = {
    "greedy": GreedySampler,
    "random": RandomSampler,
    "top_k": TopKSampler,
    "top_p": TopPSampler,
    "beam": BeamSampler,
    "contrastive": ContrastiveSampler,
}


def get_sampler(sampler: Union[str, Sampler, None],
                **defaults) -> Sampler:
    """Resolve a sampler name or instance (reference accepts either a
    keras-nlp sampler object or its string name in ``compile(sampler=...)``,
    ``gemma_causal.py:70-76``)."""
    if sampler is None:
        return GreedySampler()
    if isinstance(sampler, Sampler):
        return sampler
    if isinstance(sampler, str):
        cls = _NAMED.get(sampler)
        if cls is None:
            raise ValueError(
                f"unknown sampler {sampler!r}; one of {sorted(_NAMED)}"
            )
        return cls(**defaults)
    raise TypeError(f"sampler must be a name or Sampler, got {type(sampler)}")
