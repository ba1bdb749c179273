"""Salient-object-detection metric suite
(parity tier for the reference's ``metrics/sod/``)."""

from iseg_tpu.metrics.sod.sod_metrics import (
    MAEMetric,
    SMeasureMetric,
    EMeasureMetric,
    FMeasureV2Metric,
    WeightedFMetric,
    HCEMetric,
    mae_score,
    s_measure,
    e_measure,
    f_measures,
    weighted_f_measure,
)

__all__ = [
    "MAEMetric",
    "SMeasureMetric",
    "EMeasureMetric",
    "FMeasureV2Metric",
    "WeightedFMetric",
    "HCEMetric",
    "mae_score",
    "s_measure",
    "e_measure",
    "f_measures",
    "weighted_f_measure",
]
