"""Multivariate wide-lag linear forecaster — the linear core of the
reference's SKLearnMV strategy (MVForecaster: every target series is
regressed on ``lags`` lags of ALL series in the family and forecast
JOINTLY, each recursive step feeding every series' new prediction into
every other's lag vector; reference src/scalecast/models.py:164-420,
MVForecaster.py design assembly).

Closed-form (centered ridge normal equations — intercept unpenalized,
like models/linear.py), so the fit is a finite composition of linear
solves and the whole member replays in the ts_recursive_ols family
oracle via the global Gauss-Jordan CTE (__spark_entry__._mv_linear_ctes).

Scale shape: ONE applyInPandas task per MV *family* (a family is a
handful of co-moving series, like the reference's MVForecaster — the
wide matrix is family-sized, not corpus-sized). A corpus of many
families distributes across executors on the family key; within a
family the work is one (n·L)² Gram + n-RHS solve + an h-step
recursion, microseconds of numpy. No driver collect.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def mv_linear_fit_forecast(
    Ymat: np.ndarray, h: int, lags: int = 2, alpha: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Fit the joint wide-lag ridge on levels and forecast ``h`` steps.

    ``Ymat`` is [T x n] (time-ordered rows, one column per series).
    Design row for target time t (t = L..T-1, 0-based): x has D = n·L
    entries, column c = (l-1)·n + s encoding lag l of series s —
    x_c = Y[t - l, s]. One centered Gram (X'X + alpha·I on the slope
    diagonal; intercept recovered from means, so it is unpenalized)
    serves ALL n targets as a multi-RHS solve. The forecast recursion
    appends each jointly-predicted row to the history so later steps
    consume earlier predictions of every series — the SKLearnMV
    recursive semantics.

    Returns (fitted [T x n] — first L rows echo the actuals, like
    vecm_fit_forecast's pre-sample convention — and forecast [h x n]).
    """
    Ymat = np.asarray(Ymat, float)
    Tn, n = Ymat.shape
    L = int(lags)
    if Tn < L + 2:
        raise ValueError(f"need at least lags+2={L + 2} rows (got {Tn})")
    R = Tn - L
    D = n * L
    X = np.empty((R, D))
    for c in range(D):
        l, s = c // n + 1, c % n
        X[:, c] = Ymat[L - l : Tn - l, s]
    Yt = Ymat[L:]  # [R x n] targets
    xmu = X.mean(axis=0)
    tmu = Yt.mean(axis=0)
    Xc = X - xmu
    G = Xc.T @ Xc + float(alpha) * np.eye(D)
    B = np.linalg.solve(G, Xc.T @ (Yt - tmu))  # [D x n]

    fitted = Ymat.copy()
    fitted[L:] = tmu + Xc @ B

    hist = Ymat.copy()
    out = []
    for _ in range(int(h)):
        x = np.empty(D)
        for c in range(D):
            l, s = c // n + 1, c % n
            x[c] = hist[-l, s]
        nxt = tmu + (x - xmu) @ B
        out.append(nxt)
        hist = np.vstack([hist, nxt])
    return fitted, np.asarray(out).reshape(int(h), n)


def mv_linear_model(
    df: DataFrame,
    features=None,
    lags: int = 2,
    alpha: float = 0.0,
    family_col: str | None = None,
    **_,
) -> DataFrame:
    """Registry adapter ('mv_linear'): joint wide-lag ridge over every
    series sharing a family (default: ALL series in the frame form one
    family, the reference MVForecaster posture). Requires the lined-up
    long format (operators/multivariate.line_up_dates): every series
    present at every ds of its family.

    ``features`` is accepted (and ignored) for registry parity — the
    design is derived from the series themselves.
    """
    from scalecast_spark.models.mv_kernel import mv_apply

    L, a = int(lags), float(alpha)
    return mv_apply(
        df, family_col,
        lambda Ymat, h: mv_linear_fit_forecast(Ymat, h, L, a),
    )
