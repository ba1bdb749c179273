"""Online hard example mining.

Parity with the reference's ``losses/ohem.py:11-39``: keep pixels whose
true-class probability is below ``thresh``; if fewer than ``min_kept``
qualify, keep the ``min_kept`` hardest (highest-loss) valid pixels instead.

TPU-first: ``min_kept`` is static so ``jax.lax.top_k`` compiles to a fixed
program; no dynamic shapes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def get_ohem_fn(thresh: float = 0.7, min_kept: int = 100000) -> Callable:
    """Returns ``ohem(losses, probs, mask) -> new_mask`` applied after the
    per-pixel loss (reference ``losses/ohem.py:42`` ``get_ohem_fn``)."""

    def ohem(losses: jax.Array, true_probs: jax.Array, mask: jax.Array) -> jax.Array:
        flat_loss = losses.reshape(-1)
        flat_prob = true_probs.reshape(-1)
        flat_mask = mask.reshape(-1) > 0

        hard = flat_mask & (flat_prob < thresh)
        n_hard = jnp.sum(hard.astype(jnp.int32))

        k = min(min_kept, flat_loss.shape[0])
        # hardest-k among valid pixels (invalid pushed to -inf)
        cand = jnp.where(flat_mask, flat_loss, -jnp.inf)
        topk_vals, topk_idx = jax.lax.top_k(cand, k)
        topk_mask = jnp.zeros_like(flat_mask).at[topk_idx].set(True)
        topk_mask = topk_mask & flat_mask

        kept = jnp.where(n_hard >= k, hard, hard | topk_mask)
        return kept.astype(losses.dtype).reshape(losses.shape)

    return ohem
