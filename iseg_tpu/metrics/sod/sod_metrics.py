"""Salient-object-detection metrics.

Parity with the reference ``metrics/sod/sod_metrics.py`` (metric classes
:114,193), ``fmeasurev2.py`` (threshold-sweep handler hierarchy :22-509) and
``sod_metric_utils.py`` (distance transform / skeleton / contours — there
via TF ops with scipy ``tf.py_function`` fallbacks :35-113).

Design: per-image functional scores (numpy/scipy — eval-only path, matching
the reference's py_function tier) + streaming metric classes with the same
``update_state``/``result`` interface as the rest of ``iseg_tpu.metrics``.
``pred`` is a float saliency map in [0, 1]; ``gt`` is binary.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-8


def _prep(pred, gt):
    pred = np.asarray(pred, np.float64)
    gt = (np.asarray(gt) > 0.5).astype(np.float64)
    if pred.max() > 1.0:
        pred = pred / 255.0
    return pred, gt


def mae_score(pred, gt) -> float:
    """Mean absolute error (reference ``sod_metrics.py`` MAE)."""
    pred, gt = _prep(pred, gt)
    return float(np.mean(np.abs(pred - gt)))


# ----------------------------------------------------------- S-measure


def _ssim_region(pred, gt):
    x, y = pred.mean(), gt.mean()
    n = pred.size
    sx = ((pred - x) ** 2).sum() / max(n - 1, 1)
    sy = ((gt - y) ** 2).sum() / max(n - 1, 1)
    sxy = ((pred - x) * (gt - y)).sum() / max(n - 1, 1)
    alpha = 4 * x * y * sxy
    beta = (x**2 + y**2) * (sx + sy)
    if alpha != 0:
        return alpha / (beta + _EPS)
    return 1.0 if (alpha == 0 and beta == 0) else 0.0


def _s_object(pred, gt):
    fg = pred * gt
    bg = (1 - pred) * (1 - gt)

    def obj(region, mask):
        if mask.sum() == 0:
            return 0.0
        x = region[mask > 0.5].mean()
        sigma = region[mask > 0.5].std()
        return 2 * x / (x * x + 1 + sigma + _EPS)

    u = gt.mean()
    return u * obj(fg, gt) + (1 - u) * obj(bg, 1 - gt)


def _s_region(pred, gt):
    h, w = gt.shape
    if gt.sum() == 0:
        cy, cx = h // 2, w // 2
    else:
        ys, xs = np.nonzero(gt)
        cy, cx = int(round(ys.mean())) + 1, int(round(xs.mean())) + 1
    cy = min(max(cy, 1), h - 1)
    cx = min(max(cx, 1), w - 1)

    total = h * w
    score = 0.0
    for (py, px) in ((slice(0, cy), slice(0, cx)), (slice(0, cy), slice(cx, w)),
                     (slice(cy, h), slice(0, cx)), (slice(cy, h), slice(cx, w))):
        gpart = gt[py, px]
        ppart = pred[py, px]
        weight = gpart.size / total
        score += weight * _ssim_region(ppart, gpart)
    return score


def s_measure(pred, gt, alpha: float = 0.5) -> float:
    """Structure measure (Fan et al. 2017; reference SOD suite)."""
    pred, gt = _prep(pred, gt)
    y = gt.mean()
    if y == 0:  # fully background
        return float(1 - pred.mean())
    if y == 1:  # fully foreground
        return float(pred.mean())
    s = alpha * _s_object(pred, gt) + (1 - alpha) * _s_region(pred, gt)
    return float(max(s, 0.0))


# ----------------------------------------------------------- E-measure


def e_measure(pred, gt, threshold: float | None = None) -> float:
    """Enhanced-alignment measure (Fan et al. 2018). ``threshold=None`` uses
    the adaptive threshold 2*mean(pred)."""
    pred, gt = _prep(pred, gt)
    if threshold is None:
        threshold = min(2 * pred.mean(), 1.0)
    # an all-zero pred gives adaptive threshold 0; require strictly-positive
    # threshold so "no saliency" binarizes to empty rather than full
    binary = (pred >= max(threshold, _EPS)).astype(np.float64)

    if gt.sum() == 0:
        return float(1.0 - binary.mean())
    if gt.sum() == gt.size:
        return float(binary.mean())

    dp = binary - binary.mean()
    dg = gt - gt.mean()
    align = 2 * dp * dg / (dp * dp + dg * dg + _EPS)
    enhanced = ((align + 1) ** 2) / 4
    return float(enhanced.mean())


# ----------------------------------------------------------- F-measures


def f_measures(pred, gt, beta2: float = 0.3, num_thresholds: int = 255) -> dict:
    """Threshold-sweep precision/recall -> adaptive / mean / max F-beta
    (reference ``fmeasurev2.py:22-509`` handler family, vectorized over all
    thresholds at once)."""
    pred, gt = _prep(pred, gt)
    total_pos = gt.sum()

    # histogram trick: one pass over the image per bin set
    bins = np.linspace(0, 1, num_thresholds + 1)
    fg_hist, _ = np.histogram(pred[gt > 0.5], bins=bins)
    all_hist, _ = np.histogram(pred, bins=bins)
    # tp(t) = # fg pixels with pred >= t  (cumulative from the top)
    tp = np.cumsum(fg_hist[::-1])[::-1].astype(np.float64)
    pp = np.cumsum(all_hist[::-1])[::-1].astype(np.float64)

    precision = tp / (pp + _EPS)
    recall = tp / (total_pos + _EPS)
    fbeta = (1 + beta2) * precision * recall / (beta2 * precision + recall + _EPS)

    adaptive_t = min(2 * pred.mean(), 1.0)
    binary = pred >= adaptive_t
    tp_a = float((binary & (gt > 0.5)).sum())
    prec_a = tp_a / (binary.sum() + _EPS)
    rec_a = tp_a / (total_pos + _EPS)
    adaptive_f = (1 + beta2) * prec_a * rec_a / (beta2 * prec_a + rec_a + _EPS)

    return {
        "max_f": float(fbeta.max()),
        "mean_f": float(fbeta.mean()),
        "adaptive_f": float(adaptive_f),
        "precision": precision,
        "recall": recall,
    }


def weighted_f_measure(pred, gt, beta2: float = 1.0) -> float:
    """Weighted F-beta (Margolin et al. 2014): dependency-weighted errors via
    distance transform + gaussian smoothing (reference uses TF distance
    transform with a scipy fallback, ``sod_metric_utils.py``)."""
    from scipy import ndimage

    pred, gt = _prep(pred, gt)
    gtb = gt > 0.5
    if not gtb.any():
        return float(1.0 - pred.mean())

    e = np.abs(pred - gt)
    dst, idx = ndimage.distance_transform_edt(~gtb, return_indices=True)
    # errors outside the object take the error of the nearest object pixel
    et = e.copy()
    et[~gtb] = e[idx[0][~gtb], idx[1][~gtb]]
    ea = ndimage.gaussian_filter(et, sigma=5, truncate=0.6)
    min_e_ea = np.where(gtb & (ea < e), ea, e)
    # pixel importance: farther false positives matter less
    b = np.where(gtb, 1.0, 2.0 - np.exp(np.log(0.5) / 5 * dst))
    ew = min_e_ea * b

    tpw = gtb.sum() - ew[gtb].sum()
    fpw = ew[~gtb].sum()
    rec = 1 - ew[gtb].mean()
    prec = tpw / (tpw + fpw + _EPS)
    return float((1 + beta2) * rec * prec / (beta2 * prec + rec + _EPS))


def hce_score(pred, gt, epsilon: float = 2.0) -> float:
    """Human-correction-efforts proxy (reference HCE, DIS dataset): counts
    dominant boundary segments a human would fix — approximated as the
    number of connected false-positive/false-negative regions larger than
    ``epsilon``-eroded noise, plus their boundary complexity."""
    from scipy import ndimage

    pred, gt = _prep(pred, gt)
    binary = pred >= 0.5
    gtb = gt > 0.5
    struct = np.ones((3, 3), bool)

    score = 0.0
    for err in (binary & ~gtb, ~binary & gtb):
        # ignore epsilon-thin noise
        cleaned = ndimage.binary_opening(err, structure=struct,
                                         iterations=max(1, int(epsilon // 2)))
        labels, n = ndimage.label(cleaned)
        score += n
        if n:
            # boundary complexity: perimeter pixels / 100
            boundary = cleaned & ~ndimage.binary_erosion(cleaned, structure=struct)
            score += boundary.sum() / 100.0
    return float(score)


# ----------------------------------------------------------- metric classes


class _StreamingMean:
    def __init__(self, fn, name):
        self.fn = fn
        self.name = name
        self.reset_state()

    def reset_state(self):
        self._sum = 0.0
        self._count = 0

    def update_state(self, gts, preds):
        gts = np.asarray(gts)
        preds = np.asarray(preds)
        if gts.ndim == 2:
            gts, preds = gts[None], preds[None]
        if gts.ndim == 4:
            gts, preds = gts[..., 0], preds[..., 0]
        for g, p in zip(gts, preds):
            self._sum += self.fn(p, g)
            self._count += 1

    def result(self) -> float:
        return self._sum / max(self._count, 1)


class MAEMetric(_StreamingMean):
    def __init__(self, name="mae"):
        super().__init__(mae_score, name)


class SMeasureMetric(_StreamingMean):
    def __init__(self, alpha=0.5, name="s_measure"):
        super().__init__(lambda p, g: s_measure(p, g, alpha), name)


class EMeasureMetric(_StreamingMean):
    def __init__(self, name="e_measure"):
        super().__init__(e_measure, name)


class WeightedFMetric(_StreamingMean):
    def __init__(self, name="weighted_f"):
        super().__init__(weighted_f_measure, name)


class HCEMetric(_StreamingMean):
    def __init__(self, name="hce"):
        super().__init__(hce_score, name)


class FMeasureV2Metric:
    """Streaming adaptive/mean/max F (reference ``fmeasurev2.py``)."""

    def __init__(self, beta2=0.3, name="fmeasure"):
        self.beta2 = beta2
        self.name = name
        self.reset_state()

    def reset_state(self):
        self._scores = {"max_f": 0.0, "mean_f": 0.0, "adaptive_f": 0.0}
        self._count = 0

    def update_state(self, gts, preds):
        gts = np.asarray(gts)
        preds = np.asarray(preds)
        if gts.ndim == 2:
            gts, preds = gts[None], preds[None]
        if gts.ndim == 4:
            gts, preds = gts[..., 0], preds[..., 0]
        for g, p in zip(gts, preds):
            r = f_measures(p, g, self.beta2)
            for k in self._scores:
                self._scores[k] += r[k]
            self._count += 1

    def result(self) -> dict:
        c = max(self._count, 1)
        return {k: v / c for k, v in self._scores.items()}
