"""Numpy LOESS (locally-weighted linear regression) — the smoothing
primitive behind DetrendTransform(loess=True) and STL decomposition
(reference SeriesTransformer.py:121-311 loess=True branch and
Forecaster.py:1394-1456 STL, both via statsmodels.lowess).

Runs per series inside applyInPandas kernels — series-parallel on the
cluster, O(n·k) per series locally."""

from __future__ import annotations

import numpy as np


def loess_smooth(
    x: np.ndarray,
    y: np.ndarray,
    frac: float = 0.3,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """Tricube-weighted local LINEAR fit evaluated at every x
    (statsmodels lowess semantics with it=0 robustness iterations).
    ``weights`` multiplies per-point robustness weights into the local
    tricube weights (the robust-STL hook); None leaves the math
    untouched — bit-identical to the weightless path."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n = len(x)
    if n == 0:
        return np.empty(0)
    k = int(np.clip(np.ceil(frac * n), 2, n))
    out = np.empty(n)
    order = np.argsort(x)
    xs, ys = x[order], y[order]
    rs = weights[order] if weights is not None else None
    for pos, i in enumerate(order):
        # the k nearest x-neighbors form a contiguous run in sorted x
        lo = np.searchsorted(xs, x[i])
        lo = max(0, min(lo - k // 2, n - k))
        # slide the window to the true nearest-k span
        while lo > 0 and x[i] - xs[lo - 1] < xs[lo + k - 1] - x[i]:
            lo -= 1
        while lo + k < n and xs[lo + k] - x[i] < x[i] - xs[lo]:
            lo += 1
        xw, yw = xs[lo : lo + k], ys[lo : lo + k]
        d = np.abs(xw - x[i])
        dmax = d.max()
        w = (1.0 - (d / dmax) ** 3) ** 3 if dmax > 0 else np.ones(k)
        if rs is not None:
            wr = w * rs[lo : lo + k]
            # a window whose robustness weights are ALL zero (every
            # neighbor is an outlier — e.g. a spike's own phase
            # subseries) would divide by zero; fall back to the plain
            # tricube fit for that window, as robust LOWESS
            # implementations do
            if wr.sum() > 0:
                w = wr
        sw = w.sum()
        sx = (w * xw).sum()
        sy = (w * yw).sum()
        sxx = (w * xw * xw).sum()
        sxy = (w * xw * yw).sum()
        denom = sw * sxx - sx * sx
        if abs(denom) < 1e-12 * max(sxx, 1.0):
            out[i] = sy / sw
        else:
            b = (sw * sxy - sx * sy) / denom
            a = (sy - b * sx) / sw
            out[i] = a + b * x[i]
    return out


def loess_robust(
    x: np.ndarray,
    y: np.ndarray,
    frac: float = 0.3,
    it: int = 0,
) -> np.ndarray:
    """LOESS with Cleveland robustness iterations (statsmodels lowess
    ``it=`` semantics, the reference's DetrendTransform(loess=True)
    backend): after each fit, bisquare weights from the residuals —
    u = clip(r / (6 * median|r|), -1, 1), w = (1 - u^2)^2 — multiply
    into the next pass's local tricube weights. ``it=0`` is
    bit-identical to ``loess_smooth`` (the hash-certified gate path)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    fit = loess_smooth(x, y, frac)
    for _ in range(int(it)):
        r = y - fit
        s = np.median(np.abs(r))
        if s <= 0:
            break
        u = np.clip(r / (6.0 * s), -1.0, 1.0)
        rw = (1.0 - u * u) ** 2
        fit = loess_smooth(x, y, frac, weights=rw)
    return fit
