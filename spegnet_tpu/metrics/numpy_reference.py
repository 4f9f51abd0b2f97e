"""Trusted NumPy implementation of the five standard COD metrics.

The reference evaluates with the PySODMetrics library
(reference: utils/metrics.py:84-86,162-167): Smeasure, Emeasure (adaptive),
WeightedFmeasure, MAE and the Fmeasure threshold curve (mean).  That library
is not vendored here; this module implements the published algorithms
(S-measure: Fan et al. ICCV'17; E-measure: Fan et al. IJCAI'18; weighted F:
Margolin et al. CVPR'14; F-curve: Achanta et al.) with PySODMetrics'
conventions so numbers are comparable with the COD literature:

* inputs are uint8 prediction + uint8 GT; gt = gt > 128;
  pred = pred/255, then min-max normalized when non-constant;
* E-measure uses the *adaptive* threshold (2x mean, capped at 1);
* F-measure is the 256-threshold curve's mean, beta^2 = 0.3;
* weighted F uses bwdist to the nearest foreground pixel, a 7x7 sigma-5
  MATLAB-style Gaussian, and beta = 1.

This file is the oracle for the vectorized on-device JAX implementation
(spegnet_tpu/metrics/jax_metrics.py) and a CPU fallback at runtime.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from scipy import ndimage

_EPS = np.spacing(1)


def _prepare(pred_u8: np.ndarray, gt_u8: np.ndarray):
    gt = gt_u8 > 128
    pred = pred_u8.astype(np.float64) / 255.0
    if pred.max() != pred.min():
        pred = (pred - pred.min()) / (pred.max() - pred.min())
    return pred, gt


def mae_np(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.mean(np.abs(pred - gt.astype(np.float64))))


# ------------------------------ S-measure ----------------------------------


def _s_object_part(pred: np.ndarray, gt: np.ndarray) -> float:
    sel = pred[gt]
    if sel.size == 0:
        return 0.0
    x = sel.mean()
    sigma_x = sel.std(ddof=1) if sel.size > 1 else 0.0
    return float(2.0 * x / (x * x + 1.0 + sigma_x + _EPS))


def _s_object(pred: np.ndarray, gt: np.ndarray) -> float:
    u = gt.mean()
    fg_score = _s_object_part(pred * gt, gt)
    bg_score = _s_object_part((1.0 - pred) * (~gt), ~gt)
    return float(u * fg_score + (1.0 - u) * bg_score)


def _ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    h, w = pred.shape
    n = h * w
    if n <= 1:
        return 1.0 if np.all(pred == gt) else 0.0
    x = pred.mean()
    y = gt.mean()
    sigma_x = np.sum((pred - x) ** 2) / (n - 1)
    sigma_y = np.sum((gt - y) ** 2) / (n - 1)
    sigma_xy = np.sum((pred - x) * (gt - y)) / (n - 1)
    alpha = 4 * x * y * sigma_xy
    beta = (x * x + y * y) * (sigma_x + sigma_y)
    if alpha != 0:
        return float(alpha / (beta + _EPS))
    if alpha == 0 and beta == 0:
        return 1.0
    return 0.0


def _s_region(pred: np.ndarray, gt: np.ndarray) -> float:
    h, w = gt.shape
    area = h * w
    if np.count_nonzero(gt) == 0:
        x = int(np.round(w / 2)) + 1
        y = int(np.round(h / 2)) + 1
    else:
        yx = np.argwhere(gt).mean(axis=0).round()
        y, x = int(yx[0]) + 1, int(yx[1]) + 1
    gtf = gt.astype(np.float64)
    score = 0.0
    for rs, re, cs, ce in ((0, y, 0, x), (0, y, x, w), (y, h, 0, x), (y, h, x, w)):
        wq = (re - rs) * (ce - cs) / area
        score += wq * _ssim(pred[rs:re, cs:ce], gtf[rs:re, cs:ce])
    return float(score)


def smeasure_np(pred: np.ndarray, gt: np.ndarray, alpha: float = 0.5) -> float:
    y = gt.mean()
    if y == 0:
        return float(1.0 - pred.mean())
    if y == 1:
        return float(pred.mean())
    sm = alpha * _s_object(pred, gt) + (1 - alpha) * _s_region(pred, gt)
    return float(max(0.0, sm))


# ------------------------------ E-measure ----------------------------------


def emeasure_adaptive_np(pred: np.ndarray, gt: np.ndarray) -> float:
    gt_fg = int(np.count_nonzero(gt))
    gt_size = gt.size
    threshold = min(2 * pred.mean(), 1.0)
    binarized = pred >= threshold
    fg_fg = int(np.count_nonzero(binarized & gt))
    fg_bg = int(np.count_nonzero(binarized & ~gt))
    fg = fg_fg + fg_bg
    bg = gt_size - fg
    if gt_fg == 0:
        enhanced_sum = bg
    elif gt_fg == gt_size:
        enhanced_sum = fg
    else:
        bg_fg = gt_fg - fg_fg
        bg_bg = bg - bg_fg
        parts = [fg_fg, fg_bg, bg_fg, bg_bg]
        mean_pred = fg / gt_size
        mean_gt = gt_fg / gt_size
        combos = [
            (1 - mean_pred, 1 - mean_gt),
            (1 - mean_pred, 0 - mean_gt),
            (0 - mean_pred, 1 - mean_gt),
            (0 - mean_pred, 0 - mean_gt),
        ]
        enhanced_sum = 0.0
        for numel, (pv, gv) in zip(parts, combos):
            align = 2 * pv * gv / (pv * pv + gv * gv + _EPS)
            enhanced_sum += (align + 1) ** 2 / 4 * numel
    return float(enhanced_sum / (gt_size - 1 + _EPS))


# --------------------------- weighted F-measure -----------------------------


def _matlab_gauss2d(shape=(7, 7), sigma=5.0) -> np.ndarray:
    m, n = [(s - 1) / 2 for s in shape]
    y, x = np.ogrid[-m: m + 1, -n: n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    s = h.sum()
    if s != 0:
        h /= s
    return h


def weighted_fmeasure_np(pred: np.ndarray, gt: np.ndarray) -> float:
    if not gt.any():
        return 0.0
    dst, idx = ndimage.distance_transform_edt(~gt, return_indices=True)
    e = np.abs(pred - gt.astype(np.float64))
    et = e.copy()
    bg = ~gt
    et[bg] = et[idx[0][bg], idx[1][bg]]
    ea = ndimage.convolve(et, _matlab_gauss2d(), mode="constant", cval=0)
    min_e_ea = np.where(gt & (ea < e), ea, e)
    b = np.where(bg, 2.0 - np.exp(np.log(0.5) / 5.0 * dst), 1.0)
    ew = min_e_ea * b
    tpw = np.sum(gt) - np.sum(ew[gt])
    fpw = np.sum(ew[bg])
    r = 1 - np.mean(ew[gt])
    p = tpw / (tpw + fpw + _EPS)
    return float(2 * r * p / (r + p + _EPS))


# ------------------------------ F-measure curve -----------------------------


def fmeasure_curve_np(pred: np.ndarray, gt: np.ndarray, beta2: float = 0.3) -> np.ndarray:
    """256-value F curve (descending thresholds 255..0)."""
    pred_q = (pred * 255).astype(np.uint8)
    bins = np.linspace(0, 256, 257)
    fg_hist, _ = np.histogram(pred_q[gt], bins=bins)
    bg_hist, _ = np.histogram(pred_q[~gt], bins=bins)
    fg_w = np.cumsum(np.flip(fg_hist))
    bg_w = np.cumsum(np.flip(bg_hist))
    tps = fg_w.astype(np.float64)
    ps = (fg_w + bg_w).astype(np.float64)
    ps[ps == 0] = 1
    t = max(int(np.count_nonzero(gt)), 1)
    precisions = tps / ps
    recalls = tps / t
    numerator = (1 + beta2) * precisions * recalls
    denominator = np.where(numerator == 0, 1.0, beta2 * precisions + recalls)
    return numerator / denominator


def compute_sample_metrics_np(pred_u8: np.ndarray, gt_u8: np.ndarray) -> Dict[str, float]:
    """The five metrics for one sample, PySODMetrics conventions.

    Returns keys matching the reference's aggregation
    (reference: utils/metrics.py:161-167, 267-275).
    """
    pred, gt = _prepare(np.asarray(pred_u8), np.asarray(gt_u8))
    return {
        "sm": smeasure_np(pred, gt),
        "wfm": weighted_fmeasure_np(pred, gt),
        "mae": mae_np(pred, gt),
        "em": emeasure_adaptive_np(pred, gt),
        "fm": float(fmeasure_curve_np(pred, gt).mean()),
    }
