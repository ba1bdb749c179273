"""Online hard example mining.

Two selectors:

* the default (``ref_exact=False``): keep pixels whose true-class
  probability is below ``thresh``; if fewer than ``min_kept`` qualify,
  keep the ``min_kept`` hardest (highest-loss) valid pixels instead —
  the standard OHEM semantics (mmseg-style).
* ``ref_exact=True``: the reference's ``ohem_selector``
  (``losses/ohem.py:11-39``) REPRODUCED EXACTLY, quirks included: it
  sorts the true-class probabilities DESCENDING, takes the value at rank
  ``min(min_kept * batch, n_valid - 1)`` as a floor for the threshold,
  and keeps pixels with prob STRICTLY below ``max(that, thresh)`` — so
  ``min_kept*batch`` acts as "number of easiest pixels dropped", not
  "minimum kept" (the file is marked "WIP DO NOT USE" upstream; this
  mode exists for drop-in behavioral parity and is what the trajectory
  oracle test pins). See PARITY.md.

TPU-first: ``min_kept`` is static so ``jax.lax.top_k`` / full sorts
compile to fixed programs; the dynamic rank index is a ``jnp.take``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def get_ohem_fn(thresh: float | None = 0.7, min_kept: int = 100000,
                ref_exact: bool = False) -> Callable:
    """Returns ``ohem(losses, probs, mask) -> keep weights`` applied after
    the per-pixel loss (reference ``losses/ohem.py:42`` ``get_ohem_fn``).

    ``losses``/``probs``/``mask`` are [N, H, W]; the returned array is a
    0/1 weight map of the same shape.
    """

    def ohem_ref(losses: jax.Array, true_probs: jax.Array,
                 mask: jax.Array) -> jax.Array:
        """Reference ``ohem_selector`` bit-for-bit: flattens across the
        whole local batch, ``batch_min_kept = min_kept * N``."""
        batch = losses.shape[0]
        # the reference's selector receives the ALREADY sample-weighted
        # loss (0 on ignored pixels) — fold the mask in before sorting
        flat_loss = (losses * (mask > 0)).reshape(-1)
        n = flat_loss.shape[0]
        bmk = jnp.asarray(min(min_kept * batch, n - 1), jnp.int32)
        if thresh is not None:
            # seg_prob: true-class prob, 0 on ignored pixels (the
            # reference multiplies softmax by the all-zero one-hot)
            seg_prob = (true_probs * (mask > 0)).reshape(-1)
            non_zeros = jnp.sum((seg_prob != 0).astype(jnp.int32))
            bmk_c = jnp.minimum(bmk, non_zeros - 1)
            sorted_desc = jnp.sort(seg_prob)[::-1]
            min_threshold = jnp.where(
                non_zeros > 0,
                jnp.take(sorted_desc, jnp.maximum(bmk_c, 0)),
                jnp.zeros((), seg_prob.dtype))
            threshold = jnp.maximum(min_threshold, thresh)
            kept = (seg_prob < threshold).astype(losses.dtype)
        else:
            sorted_loss = jnp.sort(flat_loss)[::-1]
            threshold = jnp.take(sorted_loss, bmk)
            kept = (flat_loss > threshold).astype(losses.dtype)
        return kept.reshape(losses.shape)

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

    return ohem_ref if ref_exact else ohem
