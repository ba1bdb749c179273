"""Smooth-L1 and pixel contrastive losses
(reference ``losses/common.py:9``, ``losses/contrastive.py:9``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iseg_tpu.ops.numerics import l2_normalize


def smooth_l1_loss(pred: jax.Array, target: jax.Array, delta: float = 1.0) -> jax.Array:
    """Huber/smooth-L1 (reference ``losses/common.py:9``)."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(
        jnp.where(diff < delta, 0.5 * diff * diff / delta, diff - 0.5 * delta)
    )


def pixel_contrastive_loss(
    features: jax.Array,
    labels: jax.Array,
    temperature: float = 0.1,
    ignore_label: int = 255,
    max_samples: int = 1024,
) -> jax.Array:
    """InfoNCE-style pixel contrastive loss over subsampled pixel embeddings
    (reference ``losses/contrastive.py:9``).

    TPU-first: pixels are strided-subsampled to a static ``max_samples`` so
    the similarity matrix has a fixed [S, S] shape.
    """
    n, h, w, c = features.shape
    feats = features.reshape(n, h * w, c).astype(jnp.float32)
    labs = labels.reshape(n, h * w)

    total = h * w
    # ceil-division: floor would select only the first max_samples pixels
    # whenever total is not near a multiple (e.g. 45x45 -> stride 1 ->
    # top half only), deterministically excluding the image bottom
    stride = max(1, -(-total // max_samples))
    idx = jnp.arange(0, total, stride)[:max_samples]
    feats = feats[:, idx]
    labs = labs[:, idx]

    feats = l2_normalize(feats, axis=-1)
    sim = jnp.einsum("bic,bjc->bij", feats, feats) / temperature

    same = (labs[:, :, None] == labs[:, None, :]).astype(jnp.float32)
    valid = (labs != ignore_label).astype(jnp.float32)
    pair_valid = valid[:, :, None] * valid[:, None, :]
    eye = jnp.eye(sim.shape[-1], dtype=jnp.float32)[None]
    pos = same * pair_valid * (1.0 - eye)
    neg_mask = pair_valid * (1.0 - eye)

    sim = jnp.where(neg_mask > 0, sim, -1e9)
    log_prob = sim - jax.nn.logsumexp(sim, axis=-1, keepdims=True)
    pos_count = jnp.maximum(jnp.sum(pos, axis=-1), 1.0)
    loss_i = -jnp.sum(pos * log_prob, axis=-1) / pos_count
    has_pos = (jnp.sum(pos, axis=-1) > 0).astype(jnp.float32)
    return jnp.sum(loss_i * has_pos) / jnp.maximum(jnp.sum(has_pos), 1.0)
