"""Mask / dice loss family (reference ``losses/mask_loss.py:10``, dice
:159)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from iseg_tpu.losses.base import prepare_labels, valid_mask


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = 255,
    smooth: float = 1.0,
    from_logits: bool = True,
) -> jax.Array:
    """Soft multi-class dice over valid pixels
    (reference ``losses/mask_loss.py:159``)."""
    labels = prepare_labels(labels, logits)
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    mask = valid_mask(labels, ignore_label)[..., None]
    if ignore_label == 0:
        # classes stored 1..C shift to channels 0..C-1, matching the CE
        # term (cross_entropy.py) — otherwise mask_loss's two terms pull
        # the same logit channel toward different classes
        labels = labels - 1
    safe_labels = jnp.where(mask[..., 0] > 0, labels, 0).astype(jnp.int32)
    one_hot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32) * mask
    probs = jax.nn.softmax(logits, axis=-1) if from_logits else logits
    probs = probs * mask

    axes = tuple(range(1, logits.ndim - 1))  # spatial
    intersection = jnp.sum(probs * one_hot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(one_hot, axis=axes)
    dice = (2.0 * intersection + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def mask_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = 255,
    dice_weight: float = 1.0,
    ce_weight: float = 1.0,
) -> jax.Array:
    """Combined CE + dice (reference ``losses/mask_loss.py:10``)."""
    from iseg_tpu.losses.cross_entropy import cross_entropy_ignore_label

    loss = 0.0
    if ce_weight:
        loss = loss + ce_weight * cross_entropy_ignore_label(
            logits, labels, ignore_label=ignore_label
        )
    if dice_weight:
        loss = loss + dice_weight * dice_loss(logits, labels, ignore_label=ignore_label)
    return loss
