"""FmeasureV2 handler family vs hand-computed confusion-matrix values
(VERDICT round-1 missing #4; reference ``metrics/sod/fmeasurev2.py:300-757``
formulas), plus the rebuilt HCE pipeline."""

import numpy as np
import pytest

from iseg_tpu.metrics.sod import (
    BERHandler,
    DICEHandler,
    FPRHandler,
    FmeasureHandler,
    IOUHandler,
    KappaHandler,
    OverallAccuracyHandler,
    PrecisionHandler,
    RecallHandler,
    SpecificityHandler,
    TNRHandler,
    TPRHandler,
    hce_score,
)
from iseg_tpu.metrics.sod.fmeasurev2 import safe_divide


def _toy_pair():
    """8x8 case with hand-countable confusion at threshold 0.5:
    gt: left half foreground (32 px). pred: rows 0-3 of left half hot
    (tp=16), rows 0-1 of right half hot (fp=8); fn=16, tn=24."""
    gt = np.zeros((8, 8), np.uint8)
    gt[:, :4] = 255
    pred = np.zeros((8, 8), np.float64)
    pred[:4, :4] = 0.9
    pred[:2, 4:] = 0.9
    return pred, gt


TP, FP, TN, FN = 16.0, 8.0, 24.0, 16.0


@pytest.mark.parametrize("handler_cls,expected", [
    (PrecisionHandler, TP / (TP + FP)),
    (RecallHandler, TP / (TP + FN)),
    (SpecificityHandler, TN / (TN + FP)),
    (IOUHandler, TP / (TP + FP + FN)),
    (DICEHandler, 2 * TP / (2 * TP + FP + FN)),
    (OverallAccuracyHandler, (TP + TN) / 64.0),
    (FPRHandler, FP / (TN + FP)),
    (BERHandler, 1 - 0.5 * (TP / (TP + FN) + TN / (TN + FP))),
])
def test_handler_binary_matches_hand_computed(handler_cls, expected):
    pred, gt = _toy_pair()
    h = handler_cls(with_dynamic=False, with_adaptive=False, with_binary=True)
    h.update_state(pred, gt, normalize=False)
    assert h.result()["binary"] == pytest.approx(expected, abs=1e-12)


def test_binary_01_gt_is_not_all_background():
    # a {0,1} float mask (the sod_metrics convention) must binarize at
    # 0.5, not the uint8 128 rule that would zero it out silently
    pred, gt = _toy_pair()
    h = IOUHandler(with_dynamic=False, with_adaptive=False, with_binary=True)
    h.update_state(pred.astype(np.float64), gt.astype(np.float64),
                   normalize=True)
    assert h.result()["binary"] > 0.0


def test_kappa_matches_hand_computed():
    pred, gt = _toy_pair()
    h = KappaHandler(with_dynamic=False, with_adaptive=False, with_binary=True)
    h.update_state(pred, gt, normalize=False)
    total = TP + FP + TN + FN
    oa = (TP + TN) / total
    pe = ((TP + FP) * (TP + FN) + (TN + FN) * (TN + TP)) / total ** 2
    assert h.result()["binary"] == pytest.approx((oa - pe) / (1 - pe), abs=1e-12)


def test_fmeasure_beta_formula():
    pred, gt = _toy_pair()
    h = FmeasureHandler(with_dynamic=False, with_adaptive=False,
                        with_binary=True, beta=0.3)
    h.update_state(pred, gt, normalize=False)
    p = TP / (TP + FP)
    r = TP / (TP + FN)
    assert h.result()["binary"] == pytest.approx(
        1.3 * p * r / (0.3 * p + r), abs=1e-12)


def test_dynamic_sweep_curve_shape_and_endpoints():
    pred, gt = _toy_pair()
    h = RecallHandler(with_dynamic=True, with_adaptive=False)
    h.update_state(pred, gt, normalize=False)
    curve = h.result()["dynamic"]
    assert curve.shape == (256,)
    # curve index i = threshold 255-i (reversed cumsum); at the lowest
    # threshold (last entry) everything is predicted -> recall 1
    assert curve[-1] == pytest.approx(1.0)
    # at the highest threshold only pred values >= 255/255 survive -> 0
    assert curve[0] == pytest.approx(0.0)
    # recall is monotonically non-decreasing as the threshold drops
    assert np.all(np.diff(curve) >= -1e-12)


def test_dynamic_sweep_known_threshold_value():
    pred, gt = _toy_pair()
    h = PrecisionHandler(with_dynamic=True, with_adaptive=False)
    h.update_state(pred, gt, normalize=False)
    curve = h.result()["dynamic"]
    # pred values are 0 and 0.9 (uint8 229); every threshold in 1..229
    # binarizes identically to the 0.5 split -> precision 16/24
    t = 128
    assert curve[255 - t] == pytest.approx(TP / (TP + FP), abs=1e-12)


def test_adaptive_threshold_mode():
    pred, gt = _toy_pair()
    h = IOUHandler(with_dynamic=False, with_adaptive=True)
    h.update_state(pred, gt, normalize=False)
    # adaptive thr = min(2 * mean, 1); mean = 0.9 * 24/64 = 0.3375 ->
    # thr 0.675 < 0.9: same binarization as 0.5
    assert h.result()["adaptive"] == pytest.approx(TP / (TP + FP + FN))


def test_dataset_level_aggregation_differs_from_sample_mean():
    pred1, gt1 = _toy_pair()
    pred2 = np.zeros((8, 8)); gt2 = np.zeros((8, 8), np.uint8)
    pred2[0, 0] = 0.9; gt2[0, 0] = 255  # perfect tiny sample
    sample = PrecisionHandler(False, False, with_binary=True,
                              sample_based=True)
    dataset = PrecisionHandler(False, False, with_binary=True,
                               sample_based=False)
    for h in (sample, dataset):
        h.update_state(pred1, gt1, normalize=False)
        h.update_state(pred2, gt2, normalize=False)
    assert sample.result()["binary"] == pytest.approx((16 / 24 + 1.0) / 2)
    assert dataset.result()["binary"] == pytest.approx(17 / 25)


def test_normalize_path_mapminmax():
    # uint8 inputs: gt > 128, pred mapminmax to [0, 1]
    gt = np.zeros((4, 4), np.uint8); gt[:2] = 200
    pred = np.full((4, 4), 60, np.uint8); pred[:2] = 180
    h = RecallHandler(False, False, with_binary=True)
    h.update_state(pred, gt, normalize=True)
    # mapminmax -> pred rows 0-1 become 1.0 (> 0.5), rest 0.0
    assert h.result()["binary"] == pytest.approx(1.0)


def test_aliases():
    assert TNRHandler is SpecificityHandler
    assert TPRHandler is RecallHandler


def test_safe_divide_zero_denominator():
    assert safe_divide(3.0, 0.0) == 0.0
    out = safe_divide(np.ones(4), np.array([1.0, 0.0, 2.0, 0.0]))
    np.testing.assert_array_equal(out, [1.0, 0.0, 0.5, 0.0])


# ----------------------------------------------------------- HCE


def test_hce_zero_for_perfect_prediction():
    gt = np.zeros((32, 32), np.uint8)
    gt[8:24, 8:24] = 255
    assert hce_score((gt > 0).astype(np.float64), gt) == 0.0


def test_hce_positive_for_missing_region():
    gt = np.zeros((48, 48), np.uint8)
    gt[8:40, 8:40] = 255
    pred = np.zeros((48, 48), np.float64)
    pred[8:40, 8:24] = 1.0  # right half of the object missing
    assert hce_score(pred, gt) > 0


def test_hce_more_errors_cost_more():
    gt = np.zeros((64, 64), np.uint8)
    gt[8:56, 8:56] = 255
    half = np.zeros((64, 64)); half[8:56, 8:32] = 1.0
    quarter = np.zeros((64, 64)); quarter[8:32, 8:32] = 1.0
    assert hce_score(quarter, gt) >= hce_score(half, gt) > 0
