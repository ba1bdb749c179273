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


def _morph_skeleton(mask: np.ndarray) -> np.ndarray:
    """Lantuejoul morphological skeleton — the fixpoint loop of the
    reference's ``tf_skeletonize`` (``sod_metric_utils.py:427``) with
    proper binary erosion/opening: S = union_n [erode^n(A) - open(erode^n(A))]."""
    from scipy import ndimage

    struct = np.ones((3, 3), bool)
    current = mask.astype(bool)
    skeleton = np.zeros_like(current)
    for _ in range(100):
        if not current.any():
            break
        eroded = ndimage.binary_erosion(current, structure=struct)
        opened = ndimage.binary_dilation(eroded, structure=struct)
        skeleton |= current & ~opened
        current = eroded
    return skeleton


def _rdp_count(points: np.ndarray, epsilon: float) -> int:
    """Ramer-Douglas-Peucker control-point count over the point sequence
    (reference ``tf_approx_poly_dp``, ``sod_metric_utils.py:852`` — with its
    clamped segment projection), iterative to avoid recursion limits."""
    n = len(points)
    if n <= 2:
        return n
    pts = points.astype(np.float64)
    keep = np.zeros(n, bool)
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        keep[lo] = keep[hi] = True
        if hi - lo < 2:
            continue
        seg = pts[lo:hi + 1]
        start, end = seg[0], seg[-1]
        line = end - start
        denom = float(np.dot(line, line)) + 1e-8
        t = np.clip((seg - start) @ line / denom, 0.0, 1.0)
        proj = start + t[:, None] * line
        dist = np.sqrt(((seg - proj) ** 2).sum(axis=1))
        idx = int(np.argmax(dist))
        if dist[idx] > epsilon:
            stack.append((lo, lo + idx))
            stack.append((lo + idx, hi))
    return int(keep.sum())


def _edge_points(mask: np.ndarray) -> np.ndarray:
    """Sobel-magnitude boundary points in row-major order (reference
    ``tf_find_contours``, ``sod_metric_utils.py:815``)."""
    from scipy import ndimage

    m = mask.astype(np.float64)
    gx = ndimage.convolve(m, np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
                                      np.float64), mode="constant")
    gy = ndimage.convolve(m, np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
                                      np.float64), mode="constant")
    return np.argwhere(np.hypot(gx, gy) > 0)


def _filter_conditional_boundary(points, mask, condition):
    """(boundary points adjacent to ``condition``, count of touched mask
    regions) — reference ``tf_filter_conditional_boundary``
    (``sod_metric_utils.py:915``), with real 3x3 dilation + 4-connected
    labeling.

    Parity note: the reference counts unique region labels at the
    FILTERED points (its own comment calls this 'simplified') — the
    original DIS ``_cal_hce`` instead counts regions with NO filtered
    boundary at all (fully independent regions a human must handle from
    scratch). We match the reference's behavior deliberately; switch the
    count to unreached labels to follow the DIS paper instead."""
    from scipy import ndimage

    cond = ndimage.binary_dilation(condition, structure=np.ones((3, 3), bool))
    if len(points) == 0:
        return points, 0
    sel = cond[points[:, 0], points[:, 1]]
    filtered = points[sel]
    if len(filtered) == 0:
        return filtered, 0
    labeled, _ = ndimage.label(mask)
    touched = np.unique(labeled[filtered[:, 0], filtered[:, 1]])
    return filtered, int(np.count_nonzero(touched))


def hce_score(pred, gt, epsilon: float = 2.0, relax: int = 5) -> float:
    """Human Correction Effort (DIS, Qin et al. ECCV 2022) — the
    reference's ``_cal_hce`` pipeline (``sod_metrics.py:1139-1216``):
    skeleton-preserving relaxed FP/FN regions, condition-filtered boundary
    points, RDP control-point counting plus independent-region counts.

    The reference's TF helper tier is a self-described approximation whose
    ``dilation2d(ones)`` computes maxpool+1 (``sod_metric_utils.py:385`` —
    making every ``dilate(...) > 0`` all-true); this implementation keeps
    the reference's algorithm with correct binary morphology."""
    from scipy import ndimage

    pred, gtf = _prep(pred, gt)
    gtb = gtf > 0.5
    pred_binary = pred > 0.5
    struct = np.ones((3, 3), bool)

    gt_skeleton = _morph_skeleton(gtb)

    union = gtb | pred_binary
    tp = gtb & pred_binary
    fp = pred_binary ^ tp
    fn = gtb ^ tp

    eroded_union = ndimage.binary_erosion(union, structure=struct,
                                          iterations=relax)

    fp_ = fp & eroded_union
    for _ in range(relax):
        fp_ = ndimage.binary_dilation(fp_, structure=struct) & ~gtb
    fp_ = fp & fp_

    fn_ = fn & eroded_union
    for _ in range(relax):
        fn_ = ndimage.binary_dilation(fn_, structure=struct) & ~pred_binary
    fn_ = fn & fn_
    # preserve structural (skeleton) misses
    fn_ = fn_ | (gt_skeleton ^ (tp & gt_skeleton))

    bdies_fp, indep_fp = _filter_conditional_boundary(
        _edge_points(fp_), fp_, tp | fn_)
    bdies_fn, indep_fn = _filter_conditional_boundary(
        _edge_points(fn_), fn_, ~(tp | fp_ | fn_))

    return float(_rdp_count(bdies_fp, epsilon) + indep_fp
                 + _rdp_count(bdies_fn, epsilon) + indep_fn)


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
        if gts.ndim == 3 and gts.shape[-1] == 1:
            # single [H, W, 1] image, NOT a batch of H row-"images"
            gts, preds = gts[..., 0], preds[..., 0]
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
        if gts.ndim == 3 and gts.shape[-1] == 1:
            # single [H, W, 1] image, NOT a batch of H row-"images"
            gts, preds = gts[..., 0], preds[..., 0]
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
