"""VECM / Johansen: rank detection on a planted cointegrated system,
forecast error-correction behavior."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.models.vecm import (
    find_optimal_coint_rank,
    vecm_fit_forecast,
    vecm_model,
)


def _coint_system(spark, n=400, seed=4):
    """x is a random walk; z = x + stationary noise → rank 1."""
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.randn(n))
    z = x + rng.randn(n) * 0.5
    ds = pd.date_range("2020-01-01", periods=n)
    pdf = pd.concat([
        pd.DataFrame({SERIES: "x", DS: ds, Y: x}),
        pd.DataFrame({SERIES: "z", DS: ds, Y: z}),
    ])
    return spark.createDataFrame(pdf)


def _independent_walks(spark, n=400, seed=9):
    rng = np.random.RandomState(seed)
    ds = pd.date_range("2020-01-01", periods=n)
    pdf = pd.concat([
        pd.DataFrame({SERIES: "a", DS: ds, Y: np.cumsum(rng.randn(n))}),
        pd.DataFrame({SERIES: "b", DS: ds, Y: np.cumsum(rng.randn(n))}),
    ])
    return spark.createDataFrame(pdf)


def test_johansen_detects_cointegration(spark):
    res = find_optimal_coint_rank(_coint_system(spark))
    assert res["rank"] == 1
    # trace stat for r=0 must exceed the critical value
    assert res["stats"][0]["trace"] > res["stats"][0]["crit_5pct"]


def test_johansen_rejects_independent_walks(spark):
    res = find_optimal_coint_rank(_independent_walks(spark))
    assert res["rank"] == 0


def test_vecm_forecast_tracks_system():
    rng = np.random.RandomState(1)
    n = 500
    x = np.cumsum(rng.randn(n))
    z = x + rng.randn(n) * 0.3
    Ymat = np.column_stack([x, z])
    fitted, fc = vecm_fit_forecast(Ymat, 10, k_ar_diff=1, coint_rank=1)
    assert fitted.shape == (n, 2) and fc.shape == (10, 2)
    # error correction keeps the spread near its equilibrium
    spread_fc = np.abs(fc[:, 0] - fc[:, 1]).mean()
    assert spread_fc < 3.0
    # fitted one-steps track the levels closely
    assert np.corrcoef(fitted[5:, 0], Ymat[5:, 0])[0, 1] > 0.99


def test_vecm_through_registry(spark):
    from scalecast_spark.frame import TimeSeriesFrame

    df = _coint_system(spark, n=200)
    tsf = TimeSeriesFrame.from_long(df).generate_future_dates(5)
    out = vecm_model(tsf.df, k_ar_diff=1, coint_rank=1)
    fut = out.filter(F.col("is_future") == 1)
    assert fut.filter(F.col("forecast").isNotNull()).count() == 10  # 2 series x 5


def test_vecm_rank0_equals_closed_form_var_on_diffs():
    """Round-5 strengthening (now complemented by the full mv_vecm SQL
    oracle — Johansen via cyclic-Jacobi recursive CTEs, see
    __spark_entry__._vecm_oracle — this pins the degenerate member
    against independent math): at coint_rank=0 the VECM
    collapses to a VAR(1) on differences, i.e. per-equation OLS
    dY_t = c + Gamma dY_{t-1}. Solve those normal equations
    independently (numpy solve on X'X, not the model's lstsq path) and
    replay the recursive forecast by hand; the model must agree to
    float precision."""
    import numpy as np

    rng = np.random.RandomState(11)
    T, n, h = 60, 3, 6
    Ymat = np.cumsum(rng.randn(T, n), axis=0) + 50.0
    fitted, fc = vecm_fit_forecast(Ymat, h, k_ar_diff=1, coint_rank=0)

    dY = np.diff(Ymat, axis=0)
    X = np.column_stack([np.ones(len(dY) - 1), dY[:-1]])
    B = np.linalg.solve(X.T @ X, X.T @ dY[1:])  # (1+n) x n

    exp_fitted = Ymat.copy()
    exp_fitted[2:] = Ymat[1:-1] + X @ B
    assert np.allclose(fitted, exp_fitted, atol=1e-8)

    hist = Ymat.copy()
    exp = []
    for _ in range(h):
        x = np.concatenate([[1.0], hist[-1] - hist[-2]])
        nxt = hist[-1] + x @ B
        exp.append(nxt)
        hist = np.vstack([hist, nxt])
    assert np.allclose(fc, np.array(exp), atol=1e-8)
