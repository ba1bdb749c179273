"""Shared loss plumbing.

Parity with the reference's ``losses/seg_loss_base.py:12`` ``SegLossBase``:
label resize-to-logits (:66), valid-mask computation (:76-85), stable-dtype
casting. Functional (no class needed): every loss takes raw int labels +
float logits and handles masking internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iseg_tpu.ops.resize import resize_image


def prepare_labels(labels: jax.Array, logits: jax.Array) -> jax.Array:
    """Squeeze a trailing channel dim and nearest-resize labels to the
    logits' spatial size (reference ``seg_loss_base.py:66``)."""
    if labels.ndim == logits.ndim and labels.shape[-1] == 1:
        labels = labels[..., 0]
    if labels.ndim == 3 and logits.ndim == 4:
        if labels.shape[1:3] != logits.shape[1:3]:
            labels = resize_image(labels[..., None], logits.shape[1:3], "nearest")[..., 0]
    return labels


def valid_mask(labels: jax.Array, ignore_label: int) -> jax.Array:
    """fp32 mask of pixels that participate in the loss
    (reference ``seg_loss_base.py:76-85``)."""
    return (labels != ignore_label).astype(jnp.float32)
