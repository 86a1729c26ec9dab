"""MV wide-lag linear forecaster (models/mv_linear.py — the linear
core of the reference's SKLearnMV strategy): every target regressed
on lags of ALL series, joint recursive forecast. Checked against an
independent sklearn-style numpy fit (explicit design matrix +
lstsq/ridge solve + hand recursion)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y
from scalecast_spark.models.mv_linear import (
    mv_linear_fit_forecast,
    mv_linear_model,
)


def _toy_mat(T=60, n=3, seed=5):
    rng = np.random.default_rng(seed)
    Y0 = np.zeros((T, n))
    Y0[0] = rng.normal(size=n)
    A = 0.3 * rng.normal(size=(n, n)) / n + 0.5 * np.eye(n)
    for t in range(1, T):
        Y0[t] = Y0[t - 1] @ A + rng.normal(size=n) * 0.3
    return Y0


def _independent(Ymat, h, L, alpha):
    """Brute-force twin: build X row by row, solve per target via the
    UNcentered augmented system (intercept column, alpha only on slope
    diagonal), recurse by hand."""
    T, n = Ymat.shape
    R, D = T - L, n * L
    X = np.ones((R, D + 1))
    for r in range(R):
        t = L + r
        for c in range(D):
            l, s = c // n + 1, c % n
            X[r, c] = Ymat[t - l, s]
    pen = np.eye(D + 1) * alpha
    pen[D, D] = 0.0  # unpenalized intercept
    W = np.linalg.solve(X.T @ X + pen, X.T @ Ymat[L:])
    hist = Ymat.copy()
    out = []
    for _ in range(h):
        x = np.ones(D + 1)
        for c in range(D):
            l, s = c // n + 1, c % n
            x[c] = hist[-l, s]
        nxt = x @ W
        out.append(nxt)
        hist = np.vstack([hist, nxt])
    return X[:, :D] @ W[:D] + W[D], np.asarray(out)


@pytest.mark.parametrize("L,alpha", [(1, 0.0), (2, 0.0), (2, 5.0), (3, 25.0)])
def test_fit_forecast_matches_independent(L, alpha):
    Ymat = _toy_mat()
    fitted, fc = mv_linear_fit_forecast(Ymat, h=7, lags=L, alpha=alpha)
    ind_fit, ind_fc = _independent(Ymat, 7, L, alpha)
    assert fitted.shape == Ymat.shape and fc.shape == (7, 3)
    assert np.allclose(fitted[L:], ind_fit, atol=1e-8)
    assert np.allclose(fc, ind_fc, atol=1e-8)
    # pre-sample rows echo actuals (vecm convention)
    assert np.allclose(fitted[:L], Ymat[:L])


def test_cross_series_lags_matter():
    """A target driven ONLY by another series' lag must beat its own
    univariate ridge — the cross-series design is real."""
    rng = np.random.default_rng(9)
    T = 80
    x = rng.normal(size=T).cumsum()
    y = np.roll(x, 1) * 2.0
    y[0] = 0.0
    Ymat = np.column_stack([x, y])
    fitted, _ = mv_linear_fit_forecast(Ymat, h=0, lags=1, alpha=0.0)
    resid = np.abs(fitted[1:, 1] - Ymat[1:, 1])
    assert resid.max() < 1e-8  # y_t = 2*x_{t-1} is in the design, exact


def _frame(spark, Ymat, h):
    rows = []
    T, n = Ymat.shape
    d0 = pd.Timestamp("2024-01-01")
    for j in range(n):
        sid = f"s{j}"
        for t in range(T):
            rows.append((sid, d0 + pd.Timedelta(days=t), float(Ymat[t, j]), 0))
        for k in range(h):
            rows.append((sid, d0 + pd.Timedelta(days=T + k), None, 1))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[SERIES, DS, Y, IS_FUTURE])
    )


def test_model_adapter_matches_core(spark):
    Ymat = _toy_mat(T=50, n=3, seed=2)
    df = _frame(spark, Ymat, h=5)
    out = (
        mv_linear_model(df, lags=2, alpha=5.0)
        .filter(F.col(IS_FUTURE) == 1)
        .select(SERIES, DS, "forecast")
        .toPandas()
        .sort_values([SERIES, DS])
    )
    _, fc = mv_linear_fit_forecast(Ymat, h=5, lags=2, alpha=5.0)
    for j in range(3):
        got = out[out[SERIES] == f"s{j}"]["forecast"].to_numpy()
        assert np.allclose(got, fc[:, j], atol=1e-9), j
    # in-sample fitted present too
    fit_rows = (
        mv_linear_model(df, lags=2, alpha=5.0)
        .filter((F.col(IS_FUTURE) == 0) & F.col("forecast").isNotNull())
        .count()
    )
    assert fit_rows == 3 * 50


def test_family_col_partitions_fits(spark):
    """Two disjoint families fit independently: family A's series must
    get identical forecasts whether or not family B is present."""
    Ya, Yb = _toy_mat(T=40, n=2, seed=3), _toy_mat(T=40, n=2, seed=4)
    fa = _frame(spark, Ya, h=3).withColumn("fam", F.lit("A"))
    fb = (
        _frame(spark, Yb, h=3)
        .withColumn(SERIES, F.concat(F.lit("b_"), F.col(SERIES)))
        .withColumn("fam", F.lit("B"))
    )
    both = mv_linear_model(
        fa.unionByName(fb), lags=2, alpha=1.0, family_col="fam"
    )
    alone = mv_linear_model(fa, lags=2, alpha=1.0)
    got = (
        both.filter((F.col(IS_FUTURE) == 1) & (F.col("fam") == "A"))
        .select(SERIES, DS, "forecast")
        .toPandas()
        .sort_values([SERIES, DS])["forecast"]
        .to_numpy()
    )
    want = (
        alone.filter(F.col(IS_FUTURE) == 1)
        .select(SERIES, DS, "forecast")
        .toPandas()
        .sort_values([SERIES, DS])["forecast"]
        .to_numpy()
    )
    assert np.allclose(got, want, atol=1e-12)
