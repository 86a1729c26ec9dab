"""MLlib pooled-model backend + permutation feature importance."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.frame import IS_FUTURE, TimeSeriesFrame
from scalecast_spark.models.mllib_backend import (
    feature_importance,
    global_gbt_model,
    global_linear_model,
)
from scalecast_spark.operators.features import add_seasonal_regressors, add_time_trend
from scalecast_spark.sources import load_table, events_to_series


@pytest.fixture(scope="module")
def frame(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    tsf = TimeSeriesFrame.from_long(series).generate_future_dates(5)
    df, tt = add_time_trend(tsf.df)
    df, sc = add_seasonal_regressors(df, ["dayofweek"], raw=False, sincos=True)
    return df.cache(), tt + sc


def test_global_linear_model(frame):
    df, feats = frame
    out = global_linear_model(df, feats)
    fut = out.filter(F.col(IS_FUTURE) == 1)
    assert fut.filter(F.col("forecast").isNotNull()).count() == 5 * 5
    # pooled model: the SAME coefficients serve every series
    obs = out.filter((F.col(IS_FUTURE) == 0) & F.col("forecast").isNotNull())
    assert obs.count() > 0


def test_global_gbt_model(frame):
    df, feats = frame
    out = global_gbt_model(df, feats, max_iter=5, max_depth=3)
    assert out.filter(
        (F.col(IS_FUTURE) == 1) & F.col("forecast").isNotNull()
    ).count() == 25


def test_permutation_importance_ranks_signal(spark, frame):
    import numpy as np
    import pandas as pd
    from scalecast_spark.frame import DS, SERIES, Y

    # y depends on x_signal, not x_noise — importance must rank x_signal first
    rng = np.random.RandomState(0)
    n = 200
    pdf = pd.DataFrame({
        SERIES: ["s"] * n,
        DS: pd.date_range("2023-01-01", periods=n),
        "x_signal": rng.randn(n),
        "x_noise": rng.randn(n),
    })
    pdf[Y] = 5.0 * pdf["x_signal"] + rng.randn(n) * 0.1
    df = spark.createDataFrame(pdf).withColumn("is_future", F.lit(0))
    imp = feature_importance(
        df, ["x_signal", "x_noise"], global_linear_model, n_rounds=2
    ).collect()
    assert imp[0]["feature"] == "x_signal"
    assert imp[0]["importance"] > 10 * abs(imp[1]["importance"])
