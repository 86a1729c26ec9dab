"""Poly/LOESS detrend, STL, Yeo-Johnson (VERDICT r1 'Next round' #5-6),
mirroring reference test/test_SeriesTransformer.py:22-53's round-trip
style: transform → invert must restore the original series."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark.operators.transforms import DetrendTransform


def _quad_frame(spark, n=60, n_series=2):
    rows = []
    d0 = dt.date(2024, 1, 1)
    for s in range(n_series):
        for i in range(n):
            y = 5.0 + 0.3 * i + 0.02 * i * i + 3.0 * np.sin(2 * np.pi * i / 7) + s
            rows.append((f"s{s}", d0 + dt.timedelta(days=i), float(y), 0))
    return spark.createDataFrame(
        rows, schema="series_id string, ds date, y double, is_future int"
    )


def _col(df, c):
    return np.array(
        [r[c] for r in df.orderBy("series_id", "ds").select(c).collect()]
    )


def test_poly_detrend_removes_quadratic(spark):
    df = _quad_frame(spark)
    tr = DetrendTransform(poly_order=2).fit(df)
    out = tr.transform(df, "y")
    resid = _col(out, "y")
    # quadratic fully captured: residual is just the sinusoid (plus fit
    # wiggle), so no remaining growth: |resid| bounded well below the
    # removed trend's range (~0.3*60 + 0.02*3600 = 90)
    assert np.abs(resid).max() < 10.0
    # round-trip restores y
    back = tr.invert(out, "y")
    orig = _col(df, "y")
    np.testing.assert_allclose(_col(back, "y"), orig, atol=1e-8)


def test_poly_detrend_extrapolates_future(spark):
    df = _quad_frame(spark, n=50)
    fut = []
    d0 = dt.date(2024, 1, 1)
    for s in range(2):
        for i in range(50, 55):
            fut.append((f"s{s}", d0 + dt.timedelta(days=i), None, 1))
    full = df.unionByName(
        spark.createDataFrame(
            fut, schema="series_id string, ds date, y double, is_future int"
        )
    )
    tr = DetrendTransform(poly_order=2).fit(full)
    zero = full.withColumn("forecast", F.lit(0.0))
    inv = tr.invert(zero, "forecast").filter(F.col("is_future") == 1)
    vals = _col(inv.filter(F.col("series_id") == "s0"), "forecast")
    # inverting a zero forecast yields the extrapolated trend: it must
    # keep growing (quadratic) beyond the training range
    assert all(b > a for a, b in zip(vals, vals[1:]))
    expected_53 = 5.0 + 0.3 * 52 + 0.02 * 52 * 52
    assert vals[2] == pytest.approx(expected_53, rel=0.15)


def test_loess_detrend_roundtrip(spark):
    df = _quad_frame(spark)
    tr = DetrendTransform(loess=True, frac=0.4).fit(df)
    out = tr.transform(df, "y")
    resid = _col(out, "y")
    assert np.abs(resid).max() < 15.0  # trend captured
    back = tr.invert(out, "y")
    np.testing.assert_allclose(_col(back, "y"), _col(df, "y"), atol=1e-8)


def test_stl_decompose_recovers_seasonality(spark):
    df = _quad_frame(spark, n=84, n_series=1)
    from scalecast_spark.functions.stattests import stl_decompose

    out = stl_decompose(df, m=7).orderBy("ds").collect()
    y = np.array([r["y"] for r in out])
    tr = np.array([r["trend"] for r in out])
    se = np.array([r["seasonal"] for r in out])
    re = np.array([r["resid"] for r in out])
    np.testing.assert_allclose(tr + se + re, y, atol=1e-9)  # identity
    # planted weekly pattern: the seasonal component must correlate
    # strongly with the true sinusoid
    true = 3.0 * np.sin(2 * np.pi * np.arange(84) / 7)
    corr = np.corrcoef(se, true)[0, 1]
    assert corr > 0.95, f"seasonal corr {corr}"
    # trend must be smooth: first differences small vs trend range
    assert np.abs(np.diff(tr)).max() < (tr.max() - tr.min()) * 0.1


def test_yeojohnson_pt_terms_negative_regressor(spark):
    from scalecast_spark.operators.features import (
        _yeojohnson_mle_lambda,
        _yeojohnson_z,
        add_pt_terms,
    )

    rng = np.random.RandomState(7)
    vals = rng.randn(200) * 3 - 1  # plenty of negatives
    lam = _yeojohnson_mle_lambda(vals)
    assert -2.0 <= lam <= 2.0
    z = _yeojohnson_z(vals, lam)
    assert np.isfinite(z).all()
    # engine path on a frame with a negative-valued regressor
    d0 = dt.date(2024, 1, 1)
    rows = [
        ("s0", d0 + dt.timedelta(days=i), float(i), 0, float(v))
        for i, v in enumerate(vals[:100])
    ]
    df = spark.createDataFrame(
        rows, schema="series_id string, ds date, y double, is_future int, x double"
    )
    out, names = add_pt_terms(df, "x", method="yeojohnson")
    assert names == ["x_pt"]
    got = np.array([r["x_pt"] for r in out.orderBy("ds").collect()])
    lam2 = _yeojohnson_mle_lambda(vals[:100])
    np.testing.assert_allclose(got, _yeojohnson_z(vals[:100], lam2), rtol=1e-9)


def test_yeojohnson_lambda_branches():
    from scalecast_spark.operators.features import _yeojohnson_z

    x = np.array([-3.0, -0.5, 0.0, 0.5, 3.0])
    z0 = _yeojohnson_z(x, 0.0)
    np.testing.assert_allclose(z0[2:], np.log1p(x[2:]))
    z2 = _yeojohnson_z(x, 2.0)
    np.testing.assert_allclose(z2[:2], -np.log1p(-x[:2]))
    z1 = _yeojohnson_z(x, 1.0)
    np.testing.assert_allclose(z1, x)  # identity at lambda=1
