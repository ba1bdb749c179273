"""Ignore-label categorical cross-entropy (+ focal variant).

Parity with the reference's default loss
``losses/catecrossentropy_ignore_label.py:14`` — flatten -> mask
ignore_label -> one-hot -> per-class weights (:66-77) -> CE or focal ->
optional OHEM (:82-83) -> average over the global batch (:85-86) — and the
focal CE of ``losses/categorical_focal_crossentropy_loss.py:198``.

TPU-first: everything stays [N,H,W,C] fp32 inside one jitted function; the
"global" average is automatic under GSPMD because the reduction spans the
sharded batch axis.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from iseg_tpu.losses.base import prepare_labels, valid_mask


def softmax_focal_loss(
    log_probs: jax.Array,
    one_hot: jax.Array,
    gamma: float = 2.0,
    alpha: Optional[float] = 0.25,
) -> jax.Array:
    """Per-pixel focal CE given log-probs and one-hot labels
    (reference ``categorical_focal_crossentropy_loss.py:198``)."""
    probs = jnp.exp(log_probs)
    pt = jnp.sum(one_hot * probs, axis=-1)
    ce = -jnp.sum(one_hot * log_probs, axis=-1)
    loss = ((1.0 - pt) ** gamma) * ce
    if alpha is not None:
        loss = alpha * loss
    return loss


def cross_entropy_ignore_label(
    logits: jax.Array,
    labels: jax.Array,
    num_classes: Optional[int] = None,
    ignore_label: int = 255,
    class_weights: Optional[Sequence[float]] = None,
    label_smoothing: float = 0.0,
    use_focal: bool = False,
    focal_gamma: float = 2.0,
    focal_alpha: Optional[float] = 0.25,
    ohem_fn: Optional[Callable] = None,
    reduction: str = "valid_mean",
    global_batch_size: Optional[int] = None,
) -> jax.Array:
    """The framework's default segmentation loss
    (reference ``catecrossentropy_ignore_label.py:14``).

    Args:
      logits: [N, H, W, C] (any float dtype; upcast to fp32 internally).
      labels: [N, H, W] or [N, H, W, 1] int labels with ``ignore_label``.
      class_weights: optional per-class loss weights (:66-77).
      ohem_fn: from :func:`iseg_tpu.losses.get_ohem_fn`; applied to the
        per-pixel losses (:82-83).
      reduction: "valid_mean" (mean over contributing pixels), "sum",
        "none", "all_mean", or "global_batch". "all_mean" divides by the
        CONSTANT total pixel count N*H*W — the reference's default path
        (``reduction=False`` + Keras ``sum_over_batch_size`` wrapping).
        "global_batch" is the reference's ``reduction=True`` path
        (``catecrossentropy_ignore_label.py:85-86``,
        ``tf.nn.compute_average_loss``): sum of weighted pixel losses
        divided by the CONSTANT global batch-image count. Both constants
        keep the gradient scale independent of ignore-pixel coverage.
      global_batch_size: required for ``reduction="global_batch"`` — the
        total number of images per optimizer step across all replicas.
    """
    labels = prepare_labels(labels, logits)
    logits = logits.astype(jnp.float32)
    if num_classes is None:
        num_classes = logits.shape[-1]

    mask = valid_mask(labels, ignore_label)
    labels = labels.astype(jnp.int32)
    if ignore_label == 0:
        # Reference parity (catecrossentropy_ignore_label.py:58-59): when
        # the ignore id is 0, real classes are stored as 1..C and shifted
        # down so class k maps to logit channel k-1.
        labels = labels - 1
    safe_labels = jnp.where(mask > 0, labels, 0).astype(jnp.int32)

    # True-class log-prob via a one-hot comparison reduce, NOT a gather:
    # per-element take_along_axis lowers to TPU gather and measures ~2x
    # slower end-to-end at 512^2; the (labels == iota) * log_probs form is
    # elementwise + reduce, which XLA fuses without materializing a one-hot
    # buffer.
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    class_ids = jax.lax.broadcasted_iota(jnp.int32, log_probs.shape,
                                         log_probs.ndim - 1)
    sel = class_ids == safe_labels[..., None]
    true_lp = jnp.sum(jnp.where(sel, log_probs, 0.0), axis=-1)

    if label_smoothing > 0.0:
        # smoothed CE = (1-s)*CE_true + s * mean-over-classes CE
        mean_lp = jnp.mean(log_probs, axis=-1)
        base_ce = -(1.0 - label_smoothing) * true_lp - label_smoothing * mean_lp
    else:
        base_ce = -true_lp

    if use_focal:
        pt = jnp.exp(true_lp)
        pixel_loss = ((1.0 - pt) ** focal_gamma) * base_ce
        if focal_alpha is not None:
            pixel_loss = focal_alpha * pixel_loss
    else:
        pixel_loss = base_ce

    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        # same comparison-reduce trick as true_lp (gathers are slow on TPU)
        pixel_weights = jnp.sum(jnp.where(sel, w, 0.0), axis=-1)
        pixel_loss = pixel_loss * pixel_weights
        weight_map = pixel_weights * mask
    else:
        weight_map = mask

    if ohem_fn is not None:
        true_probs = jnp.exp(true_lp)
        kept = ohem_fn(pixel_loss, true_probs, mask)
        mask = mask * kept
        weight_map = weight_map * kept

    pixel_loss = pixel_loss * mask

    if reduction == "none":
        return pixel_loss
    total = jnp.sum(pixel_loss)
    if reduction == "sum":
        return total
    if reduction == "all_mean":
        return total / jnp.float32(pixel_loss.size)
    if reduction == "global_batch":
        if global_batch_size is None:
            raise ValueError(
                "reduction='global_batch' requires global_batch_size "
                "(total images per step across all replicas)")
        return total / jnp.float32(global_batch_size)
    if reduction != "valid_mean":
        # silently falling through would compute a mean with the wrong
        # gradient scale for typos like "mean"/"sum_over_batch_size"
        raise ValueError(
            f"unknown reduction {reduction!r}: expected none/sum/"
            "all_mean/global_batch/valid_mean")
    denom = jnp.maximum(jnp.sum(weight_map), 1.0)
    return total / denom
