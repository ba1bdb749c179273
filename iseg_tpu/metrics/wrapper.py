"""Metric input preprocessing.

Parity with the reference's ``metrics/seg_metric_wrapper.py:22-68``
``process_seg_metric_inputs``: ignore-label masking + argmax + label resize
before the inner metric, and the ``SegMetricWrapper`` (:72) that chains an
optional pre-compute fn.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from iseg_tpu.ops.resize import resize_image


def process_seg_metric_inputs(
    labels: jax.Array,
    preds: jax.Array,
    ignore_label: int = 255,
):
    """Returns (labels, pred_ids, weights) ready for a confusion-matrix
    metric. ``preds`` may be logits [N,H,W,C] (argmax'd) or class ids."""
    if labels.ndim == 4 and labels.shape[-1] == 1:
        labels = labels[..., 0]

    if preds.ndim == labels.ndim + 1:
        # logits: resize labels to logits resolution if needed, then argmax
        if preds.shape[1:3] != labels.shape[1:3]:
            labels = resize_image(labels[..., None], preds.shape[1:3], "nearest")[..., 0]
        preds = jnp.argmax(preds, axis=-1)

    not_ignore = labels != ignore_label
    if ignore_label == 0:
        # classes stored 1..C shift down to 0..C-1, matching the CE loss's
        # shift (reference seg_metric_wrapper.py:60-61); without this the
        # metric compares every class against the wrong prediction channel
        labels = labels - 1
    weights = not_ignore.astype(jnp.float32)
    safe_labels = jnp.where(not_ignore, labels, 0)
    return safe_labels, preds, weights


class SegMetricWrapper:
    """Wrap an inner metric object with seg-input preprocessing + an optional
    chain of pre-compute fns (reference ``seg_metric_wrapper.py:72-92``)."""

    def __init__(
        self,
        metric,
        ignore_label: int = 255,
        pre_compute_fn: Optional[Callable] = None,
        name: Optional[str] = None,
    ):
        self.metric = metric
        self.ignore_label = ignore_label
        self.pre_compute_fn = pre_compute_fn
        self.name = name or getattr(metric, "name", "metric")

    def update_state(self, labels, preds):
        if self.pre_compute_fn is not None:
            labels, preds = self.pre_compute_fn(labels, preds)
        # the wrapper's whole contract: preprocessing runs before the
        # inner metric (reference seg_metric_wrapper.py:95-102). Wrap RAW
        # metrics (e.g. a bare confusion accumulator) — self-preprocessing
        # metrics like MeanIoU need no wrapper and would double-process.
        labels, preds, weights = process_seg_metric_inputs(
            labels, preds, ignore_label=self.ignore_label)
        try:
            self.metric.update_state(labels, preds, weights)
        except TypeError:  # inner metric without a sample-weight arg
            self.metric.update_state(labels, preds)

    def result(self):
        return self.metric.result()

    def reset_state(self):
        self.metric.reset_state()
