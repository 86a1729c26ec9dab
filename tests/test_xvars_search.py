"""Xvars ingest, transformation searches, VAR order selection."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.operators.xvars import ingest_Xvars_df, add_series
from scalecast_spark.transform_search import (
    find_optimal_transformation,
    find_statistical_transformation,
)
from scalecast_spark.functions.var_select import find_optimal_lag_order
from scalecast_spark.operators import transforms as TR
from scalecast_spark.sources import load_table, events_to_series


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    return events_to_series(load_table(spark, sf_dir, "events")).cache()


def test_ingest_xvars_with_dummies_and_pad(spark, series):
    xpdf = pd.DataFrame({
        "Date": pd.date_range("2024-01-01", periods=20),
        "x_num": np.arange(20.0),
        "x_cat": (["a", "b"] * 10),
    })
    out, names = ingest_Xvars_df(series, spark.createDataFrame(xpdf),
                                 date_col="Date", pad=True)
    assert set(names) == {"x_num", "x_cat_a", "x_cat_b"}
    pdf = out.filter(F.col(SERIES) == "click").orderBy(DS).toPandas()
    # padded beyond xdf range with zeros
    assert pdf["x_num"].iloc[-1] == 0.0
    assert set(pdf["x_cat_a"].unique()) <= {0.0, 1.0}


def test_add_series_as_regressor(series):
    click = series.filter(F.col(SERIES) == "click")
    other = series.filter(F.col(SERIES) == "view")
    out, names = add_series(click, other, "view_y")
    assert names == ["view_y"]
    joined = out.join(
        other.select(DS, F.col(Y).alias("expect")), DS
    ).filter(F.col("view_y") != F.col("expect"))
    assert joined.count() == 0


def test_statistical_transformation_on_walk(spark):
    rng = np.random.RandomState(5)
    walk = spark.createDataFrame(pd.DataFrame({
        SERIES: ["w"] * 300,
        DS: pd.date_range("2020-01-01", periods=300),
        Y: np.exp(np.cumsum(rng.randn(300) * 0.05) + 5),
    }))
    steps = find_statistical_transformation(walk)
    kinds = [type(s).__name__ for s in steps]
    # positive non-stationary series → log + first difference
    assert "LogTransform" in kinds and "DiffTransform" in kinds


def test_optimal_transformation_improves_score(series):
    steps = find_optimal_transformation(series, m=7, val_len=7)
    # returns some (possibly empty) stack without error; all fitted
    for s in steps:
        assert isinstance(s, TR.Transform)


def test_var_order_selection_recovers_lag(spark):
    rng = np.random.RandomState(11)
    n = 400
    a = np.zeros(n); b = np.zeros(n)
    for t in range(2, n):
        a[t] = 0.6 * a[t - 1] + 0.2 * b[t - 2] + rng.randn() * 0.5
        b[t] = 0.5 * b[t - 1] - 0.2 * a[t - 2] + rng.randn() * 0.5
    rows = []
    ds = pd.date_range("2020-01-01", periods=n)
    for sid, arr in [("a", a), ("b", b)]:
        rows.append(pd.DataFrame({SERIES: sid, DS: ds, Y: arr}))
    df = spark.createDataFrame(pd.concat(rows))
    res = find_optimal_lag_order(df, maxlags=4)
    assert res["aic"] == 2  # true order
    assert res["bic"] in (1, 2)
