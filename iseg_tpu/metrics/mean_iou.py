"""Streaming mean-IoU.

Parity with the reference's ``metrics/mean_iou.py:86`` ``MeanIOU``: a
confusion-matrix accumulator (:106-130) with per-class IoU + valid-entry
counting (:59-82). Functional core + a small host-side stateful wrapper for
eval loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.metrics.confusion import confusion_matrix
from iseg_tpu.metrics.wrapper import process_seg_metric_inputs


def iou_from_confusion(cm) -> tuple[np.ndarray, float]:
    """(per_class_iou, mean_iou) from a [C, C] confusion matrix
    (reference ``metrics/mean_iou.py:59-82``): classes that never appear
    (row+col == 0) are excluded from the mean. Host-side fp64 math."""
    cm = np.asarray(cm, np.float64)
    tp = np.diagonal(cm)
    row = np.sum(cm, axis=1)
    col = np.sum(cm, axis=0)
    denom = row + col - tp
    valid = denom > 0
    iou = np.where(valid, tp / np.maximum(denom, 1e-12), 0.0)
    mean = float(np.sum(iou) / max(np.sum(valid), 1.0))
    return iou, mean


class MeanIoU:
    """Host-side streaming mIoU: jitted per-batch CM + fp64 numpy running sum.

    Usage mirrors a Keras metric (reference ``mean_iou.py:86``):
    ``update_state(labels, preds_or_logits)`` then ``result()``.
    """

    def __init__(self, num_classes: int, ignore_label: int = 255, name: str = "mean_iou"):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.name = name
        self.reset_state()

        def _cm(labels, preds):
            labels, preds, w = process_seg_metric_inputs(
                labels, preds, ignore_label=self.ignore_label
            )
            return confusion_matrix(labels, preds, self.num_classes, weights=w)

        self._cm_fn = jax.jit(_cm)

    def reset_state(self):
        self.total_cm = np.zeros((self.num_classes, self.num_classes), np.float64)

    def update_state(self, labels, preds):
        """``preds`` may be [N,H,W] class ids or [N,H,W,C] logits."""
        self.total_cm += np.asarray(self._cm_fn(labels, preds), np.float64)

    def result(self) -> float:
        _, mean = iou_from_confusion(self.total_cm)
        return float(mean)

    def per_class_iou(self) -> np.ndarray:
        iou, _ = iou_from_confusion(self.total_cm)
        return np.asarray(iou)
