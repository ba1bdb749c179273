"""Segmentation metrics (parity tier for the reference's ``metrics/``)."""

from iseg_tpu.metrics.confusion import confusion_matrix
from iseg_tpu.metrics.mean_iou import MeanIoU, iou_from_confusion
from iseg_tpu.metrics.wrapper import process_seg_metric_inputs, SegMetricWrapper
from iseg_tpu.metrics.builder import SegMetricBuilder

__all__ = [
    "confusion_matrix",
    "MeanIoU",
    "iou_from_confusion",
    "process_seg_metric_inputs",
    "SegMetricWrapper",
    "SegMetricBuilder",
]
