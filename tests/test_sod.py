"""SOD metric tests: analytic sanity properties per metric."""

import numpy as np
import pytest

from iseg_tpu.metrics.sod import (
    EMeasureMetric,
    FMeasureV2Metric,
    MAEMetric,
    SMeasureMetric,
    WeightedFMetric,
    e_measure,
    f_measures,
    mae_score,
    s_measure,
    weighted_f_measure,
)
from iseg_tpu.metrics.sod.sod_metrics import hce_score


def _gt():
    gt = np.zeros((32, 32))
    gt[8:24, 8:24] = 1.0
    return gt


def test_mae():
    gt = _gt()
    assert mae_score(gt, gt) == 0.0
    assert mae_score(1 - gt, gt) == 1.0
    assert 0 < mae_score(np.full_like(gt, 0.5), gt) <= 0.5


def test_perfect_prediction_scores():
    gt = _gt()
    assert s_measure(gt, gt) > 0.95
    assert e_measure(gt, gt) > 0.95
    f = f_measures(gt, gt)
    assert f["max_f"] > 0.95
    assert weighted_f_measure(gt, gt) > 0.95


def test_inverted_prediction_scores_low():
    gt = _gt()
    pred = 1 - gt
    assert s_measure(pred, gt) < 0.5
    assert f_measures(pred, gt)["max_f"] < 0.5
    assert weighted_f_measure(pred, gt) < 0.3


def test_better_pred_scores_higher():
    gt = _gt()
    good = np.clip(gt + np.random.RandomState(0).rand(32, 32) * 0.1, 0, 1)
    bad = np.random.RandomState(1).rand(32, 32)
    for fn in (s_measure, e_measure, lambda p, g: f_measures(p, g)["mean_f"],
               weighted_f_measure):
        assert fn(good, gt) > fn(bad, gt)


def test_empty_gt_edge_case():
    gt = np.zeros((16, 16))
    pred = np.zeros((16, 16))
    assert mae_score(pred, gt) == 0.0
    assert s_measure(pred, gt) == 1.0
    assert e_measure(pred, gt) == 1.0
    assert weighted_f_measure(pred, gt) == 1.0


def test_uint8_saliency_maps_accepted():
    gt = _gt()
    pred255 = (gt * 255).astype(np.uint8)
    assert mae_score(pred255, gt) == 0.0


def test_hce_zero_for_perfect():
    gt = _gt()
    assert hce_score(gt, gt) == 0.0
    # a small isolated far-away FP blob sits outside the relaxed union and
    # costs nothing (reference _cal_hce relax semantics,
    # sod_metrics.py:1166-1178); an error eating into the object costs > 0
    noisy = gt.copy()
    noisy[2:6, 2:6] = 1.0
    assert hce_score(noisy, gt) == 0.0
    missing = gt.copy()
    missing[8:24, 16:24] = 0.0  # right half of the object missing
    assert hce_score(missing, gt) > 0


def test_streaming_classes_batch_and_single():
    gt = _gt()
    m = MAEMetric()
    m.update_state(gt, gt)                       # [H, W]
    m.update_state(gt[None, ..., None], (1 - gt)[None, ..., None])  # [N,H,W,1]
    assert abs(m.result() - 0.5) < 1e-6

    # a single [H, W, 1] image must count as ONE sample, not H row-images
    m2 = MAEMetric()
    m2.update_state(gt[..., None], gt[..., None])
    assert m2._count == 1
    assert m2.result() == 0.0
    m.reset_state()
    assert m.result() == 0.0

    f = FMeasureV2Metric()
    f.update_state(np.stack([gt, gt]), np.stack([gt, gt]))
    res = f.result()
    assert res["max_f"] > 0.95 and res["adaptive_f"] > 0.95

    for cls in (SMeasureMetric, EMeasureMetric, WeightedFMetric):
        metric = cls()
        metric.update_state(gt, gt)
        assert metric.result() > 0.9
