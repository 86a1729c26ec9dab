"""Exponential-smoothing family — numpy recursions per series.

Replaces the reference's statsmodels-backed HWES (models.py:970-1059)
and darts-backed Theta (models.py:880-968) with direct implementations
of the public algorithm definitions (Hyndman & Athanasopoulos, FPP):

  * SES          — level-only exponential smoothing
  * Holt         — level + trend
  * Holt-Winters — level + trend + additive seasonality, m-periodic
  * Theta        — classic decomposition: SES of the theta=2 line
                   combined with the linear-trend (theta=0) line

Each runs inside run_series_kernel: parallel across series, O(n) per
series. Smoothing parameters are chosen by a small grid search on
in-sample SSE (the reference's statsmodels fit does MLE; a coarse grid
is deterministic and library-free).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from scalecast_spark.models.kernel import run_series_kernel


def _ses_run(y: np.ndarray, alpha: float) -> tuple[np.ndarray, float]:
    level = y[0]
    fitted = np.empty(len(y))
    fitted[0] = level
    for t in range(1, len(y)):
        fitted[t] = level
        level = alpha * y[t] + (1 - alpha) * level
    return fitted, level


def _ses_best(y: np.ndarray, grid=None) -> tuple[np.ndarray, float, float]:
    grid = grid or np.linspace(0.05, 0.95, 19)
    best = None
    for a in grid:
        fitted, level = _ses_run(y, a)
        sse = float(((y - fitted) ** 2).sum())
        if best is None or sse < best[0]:
            best = (sse, fitted, level, a)
    return best[1], best[2], best[3]


def ses(y: np.ndarray, h: int) -> tuple[np.ndarray, np.ndarray]:
    fitted, level, _ = _ses_best(y)
    return fitted, np.full(h, level)


def holt(
    y: np.ndarray, h: int, damped: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Holt's linear method; ``damped`` adds the phi-damped trend
    (Gardner & McKenzie; FPP §8.2: forecast uses the phi^1..phi^k
    partial sums so the trend flattens to an asymptote)."""
    phis = (0.8, 0.9, 0.95, 0.98) if damped else (1.0,)
    best = None
    for a in np.linspace(0.1, 0.9, 9):
        for b in np.linspace(0.05, 0.45, 5):
            for phi in phis:
                level, trend = y[0], y[1] - y[0]
                fitted = np.empty(len(y))
                for t in range(len(y)):
                    fitted[t] = level + phi * trend
                    new_level = a * y[t] + (1 - a) * (level + phi * trend)
                    trend = b * (new_level - level) + (1 - b) * phi * trend
                    level = new_level
                sse = float(((y - fitted) ** 2).sum())
                if best is None or sse < best[0]:
                    best = (sse, fitted, level, trend, phi)
    _, fitted, level, trend, phi = best
    steps = np.cumsum(phi ** np.arange(1, h + 1))
    return fitted, level + trend * steps


def holt_winters(
    y: np.ndarray, h: int, m: int = 7,
    seasonal_type: str = "add", damped: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Holt-Winters with additive or multiplicative seasonality and
    optional phi-damped trend (FPP §8.3; the reference's statsmodels
    ``seasonal=`add'|'mul'`` / ``damped_trend`` pass-through,
    models.py:970-1059). Falls back to Holt when the series is shorter
    than two seasons; multiplicative needs strictly positive data and
    falls back to additive otherwise."""
    n = len(y)
    if n < 2 * m:
        return holt(y, h, damped)
    mul = seasonal_type == "mul" and np.all(y > 0)
    season0 = np.array([y[i::m][: n // m].mean() for i in range(m)])
    if mul:
        season0 = season0 / season0.mean()
    else:
        season0 = season0 - season0.mean()
    phis = (0.8, 0.9, 0.98) if damped else (1.0,)
    best = None
    for a in (0.2, 0.4, 0.6, 0.8):
        for b in (0.05, 0.15, 0.3):
            for g in (0.05, 0.2, 0.4):
                for phi in phis:
                    level = y[:m].mean()
                    trend = (y[m : 2 * m].mean() - y[:m].mean()) / m
                    season = season0.copy()
                    fitted = np.empty(n)
                    for t in range(n):
                        s = season[t % m]
                        base = level + phi * trend
                        fitted[t] = base * s if mul else base + s
                        if mul:
                            new_level = a * (y[t] / s) + (1 - a) * base
                        else:
                            new_level = a * (y[t] - s) + (1 - a) * base
                        trend = b * (new_level - level) + (1 - b) * phi * trend
                        if mul:
                            season[t % m] = g * (y[t] / new_level) + (1 - g) * s
                        else:
                            season[t % m] = g * (y[t] - new_level) + (1 - g) * s
                        level = new_level
                    sse = float(((y - fitted) ** 2).sum())
                    if best is None or sse < best[0]:
                        best = (sse, fitted, level, trend, season.copy(), phi)
    _, fitted, level, trend, season, phi = best
    steps = np.cumsum(phi ** np.arange(1, h + 1))
    if mul:
        fc = np.array(
            [(level + trend * steps[i]) * season[(n + i) % m] for i in range(h)]
        )
    else:
        fc = np.array(
            [level + trend * steps[i] + season[(n + i) % m] for i in range(h)]
        )
    return fitted, fc


def _check_seasonality(y: np.ndarray, m: int) -> bool:
    """darts-style seasonality test (utils.statistics.check_seasonality):
    the lag-m autocorrelation must clear the Bartlett 90% significance
    band |r_m| > 1.645 * sqrt((1 + 2*sum_{k<m} r_k^2) / n)."""
    n = len(y)
    if m <= 1 or n < 3 * m:
        return False
    # linear-detrend first: a trend drives ALL autocorrelations toward
    # 1, so the raw lag-m ACF would flag any trending series seasonal
    t = np.arange(n, dtype=float)
    slope, icept = np.polyfit(t, y, 1)
    z = y - (icept + slope * t)
    z = z - z.mean()
    denom = float(z @ z)
    if denom <= 0:
        return False
    r = np.array([float(z[k:] @ z[:-k]) / denom for k in range(1, m + 1)])
    band = 1.645 * np.sqrt((1.0 + 2.0 * float(r[:-1] @ r[:-1])) / n)
    return abs(r[-1]) > band


def theta(
    y: np.ndarray, h: int, m: int = 0, season_mode: str = "mul"
) -> tuple[np.ndarray, np.ndarray]:
    """Classic Theta(0,2): average of the extrapolated linear-trend line
    (theta=0) and SES of the theta=2 line. The M3-winning method in its
    standard closed form.

    With ``m > 1`` follows the darts Theta recipe the reference wraps
    (models.py:880-968): test seasonality (lag-m ACF vs the Bartlett
    band), deseasonalize by seasonal means (ratio for ``'mul'``,
    centered for ``'add'``), run Theta, reseasonalize fitted+forecast.
    Non-seasonal series skip the adjustment entirely."""
    n = len(y)
    seas = None
    if m > 1 and _check_seasonality(y, m):
        # seasonal profile from the DETRENDED series: raw per-phase
        # means of a trending series contain slope*i, which would leak
        # a spurious sawtooth of amplitude slope*(m-1)/2 into the
        # profile (darts deseasonalizes via seasonal_decompose, which
        # removes the trend first, for the same reason)
        tt = np.arange(n, dtype=float)
        sl, ic = np.polyfit(tt, y, 1)
        tl = ic + sl * tt
        mul = season_mode == "mul" and np.all(y > 0) and np.all(tl > 0)
        if mul:
            ratio = y / tl
            means = np.array([ratio[i::m].mean() for i in range(m)])
            seas = ("mul", means / means.mean())
            y = y / seas[1][np.arange(n) % m]
        else:
            resid = y - tl
            means = np.array([resid[i::m].mean() for i in range(m)])
            seas = ("add", means - means.mean())
            y = y - seas[1][np.arange(n) % m]
    t = np.arange(1, n + 1, dtype=float)
    slope, icept = np.polyfit(t, y, 1)
    trend_line = icept + slope * t
    theta2 = 2.0 * y - trend_line
    fitted2, level2, _ = _ses_best(theta2)
    fitted = 0.5 * (trend_line + fitted2)
    fut_t = np.arange(n + 1, n + h + 1, dtype=float)
    fc = 0.5 * ((icept + slope * fut_t) + np.full(h, level2))
    if seas is not None:
        kind, sv = seas
        fidx = np.arange(n) % m
        cidx = (n + np.arange(h)) % m
        if kind == "mul":
            fitted, fc = fitted * sv[fidx], fc * sv[cidx]
        else:
            fitted, fc = fitted + sv[fidx], fc + sv[cidx]
    return fitted, fc


# ------------------------------------------------- registry adapters


def hwes_model(
    df: DataFrame, features=None, trend: bool = True, seasonal=True,
    m: int | str = "auto", damped_trend: bool = False, **_,
) -> DataFrame:
    """Reference 'hwes' (statsmodels ExponentialSmoothing passthrough,
    models.py:970-1059): ``seasonal`` accepts True/'add'/'mul'/False,
    ``damped_trend`` enables the phi-damped trend. ``m='auto'`` (the
    round-6 default) resolves the season length from the frame's
    inferred frequency (functions/seasonal.py — reference
    util.py:58-83), so daily data gets 7, monthly 12, weekly 52
    without an explicit argument."""
    if seasonal:
        from scalecast_spark.functions.seasonal import resolve_m

        m = resolve_m(m, df)
        stype = "mul" if seasonal == "mul" else "add"
        return run_series_kernel(
            df, lambda y, h: holt_winters(y, h, m, stype, damped_trend)
        )
    if trend:
        return run_series_kernel(df, lambda y, h: holt(y, h, damped_trend))
    return run_series_kernel(df, ses)


def theta_model(
    df: DataFrame, features=None, m: int | str = 0, season_mode: str = "mul", **_
) -> DataFrame:
    """Reference 'theta' (darts wrapper, models.py:880-968): pass
    ``m`` (seasonal period) to enable the darts-style
    test-deseasonalize-reseasonalize path — ``m='auto'`` resolves it
    from the frame's inferred frequency; the default stays the pure
    classic Theta(0,2)."""
    if m == "auto":
        from scalecast_spark.functions.seasonal import resolve_m

        m = resolve_m(m, df)
    return run_series_kernel(df, lambda y, h: theta(y, h, m, season_mode))
