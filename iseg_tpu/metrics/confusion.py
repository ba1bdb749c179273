"""Confusion-matrix accumulation.

Parity with the reference's patched/batched confusion matrix
(``metrics/confusion_matrix.py:65,146``). TPU-first: a single
``jnp.bincount`` over ``label * C + pred`` with a static length — one fused
scatter-add, no host round-trips; accumulation across devices is a psum the
GSPMD partitioner inserts when the [C, C] result is replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(
    labels: jax.Array,
    preds: jax.Array,
    num_classes: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """[C, C] confusion matrix; rows = true class, cols = predicted.

    ``weights`` (same shape as labels) zeroes out ignored pixels; callers
    use :func:`iseg_tpu.metrics.process_seg_metric_inputs` to build it.
    fp64 is unsupported on TPU, so counts accumulate in fp32 (exact for
    counts < 2^24 per update) — the running total is kept in fp64 host-side
    by :class:`iseg_tpu.metrics.MeanIoU`.
    """
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    if weights is None:
        w = jnp.ones_like(labels, jnp.float32)
    else:
        w = weights.reshape(-1).astype(jnp.float32)

    # clamp (masked pixels have weight 0, value irrelevant)
    labels = jnp.clip(labels, 0, num_classes - 1)
    preds = jnp.clip(preds, 0, num_classes - 1)
    idx = labels * num_classes + preds
    cm = jnp.bincount(idx, weights=w, length=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes).astype(jnp.float32)
