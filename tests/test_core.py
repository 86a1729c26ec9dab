"""Core frame / features / transforms / models smoke + invariants,
modeled on the reference's test strategy (SURVEY.md §5): round-trip
invariants for transforms, regressor-existence checks for features,
numeric spot checks vs pandas for models."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.frame import TimeSeriesFrame, SERIES, DS, Y, IS_FUTURE
from scalecast_spark.sources import load_table, events_to_series
from scalecast_spark.operators import features as feat
from scalecast_spark.operators import transforms as tr
from scalecast_spark.functions import metrics as M
from scalecast_spark.functions.conformal import conformal_widths, apply_intervals
from scalecast_spark.models import naive_model, linear_model
from scalecast_spark.models.linear import linear_trend_model


@pytest.fixture(scope="module")
def tsf(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    long_df = events_to_series(events)
    t = TimeSeriesFrame.from_long(long_df)
    return t


def test_frame_basics(tsf):
    assert tsf.freq_seconds == 86400.0
    ids = tsf.series_ids()
    assert set(ids) == {"click", "view", "purchase", "signup", "error"}


def test_horizon_generation(tsf):
    t2 = tsf.generate_future_dates(7)
    fut = t2.future.groupBy(SERIES).count().collect()
    assert all(r["count"] == 7 for r in fut)
    # future dates continue at daily frequency from each series' max
    row = (
        t2.df.filter(F.col(SERIES) == "click")
        .orderBy(F.desc(DS))
        .limit(1)
        .collect()[0]
    )
    assert row[IS_FUTURE] == 1


def test_chop_and_keep(tsf):
    n0 = tsf.observed.count()
    assert tsf.chop_from_front(3).observed.count() == n0 - 3 * 5
    assert tsf.chop_from_back(3).observed.count() == n0 - 3 * 5
    kept = tsf.keep_smaller_history(10).observed.groupBy(SERIES).count().collect()
    assert all(r["count"] == 10 for r in kept)


def test_ar_terms_match_pandas(tsf):
    df, names = feat.add_ar_terms(tsf.df, 3)
    assert names == ["ar_1", "ar_2", "ar_3"]
    pdf = df.filter(F.col(SERIES) == "click").orderBy(DS).toPandas()
    expected = pdf[Y].shift(1)
    got = pdf["ar_1"]
    assert np.allclose(got.dropna(), expected.dropna())


def test_seasonal_and_trend_features(tsf):
    df, n1 = feat.add_time_trend(tsf.df)
    df, n2 = feat.add_seasonal_regressors(df, ["dayofweek"], raw=True, sincos=True, dummy=True)
    cols = set(df.columns)
    assert {"t", "dayofweek", "dayofweeksin1", "dayofweekcos2", "dayofweek_7"} <= cols
    pdf = df.filter(F.col(SERIES) == "click").orderBy(DS).limit(5).toPandas()
    assert list(pdf["t"]) == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_rolling_mean_matches_pandas(tsf):
    df, _ = feat.add_rolling_mean(tsf.df, 7)
    pdf = df.filter(F.col(SERIES) == "view").orderBy(DS).toPandas()
    exp = pdf[Y].shift(1).rolling(7, min_periods=1).mean()
    assert np.allclose(pdf["rolling_mean_7"].dropna(), exp.dropna())


@pytest.mark.parametrize(
    "transform",
    [
        tr.LogTransform(),
        tr.SqrtTransform(),
        tr.BoxCoxTransform(0.5),
        tr.BoxCoxTransform(0.0),
        tr.ScaleTransform(),
        tr.MinMaxTransform(),
        tr.RobustScaleTransform(),
        tr.DetrendTransform(),
        tr.DeseasonTransform(7),
        tr.DiffTransform(1),
        tr.DiffTransform(7),
    ],
)
def test_transform_roundtrip(tsf, transform):
    """revert(transform(y)) == y — the reference's core invariant
    (test_SeriesTransformer.py:22-53, to 2 decimals; we demand 1e-6)."""
    orig = tsf.df.filter(F.col(SERIES).isin("click", "error")).cache()
    transform.fit(orig)
    tdf = transform.transform(orig, Y)
    back = transform.invert(tdf, Y)
    joined = (
        orig.select(SERIES, DS, F.col(Y).alias("y0"))
        .join(back.select(SERIES, DS, F.col(Y).alias("y1")), [SERIES, DS])
        .select(F.max(F.abs(F.col("y0") - F.col("y1"))).alias("err"))
        .collect()[0]
    )
    assert joined["err"] < 1e-6


def test_pipeline_roundtrip(tsf):
    pipe = tr.Pipeline([tr.LogTransform(), tr.DiffTransform(1)])
    orig = tsf.df.cache()
    tdf = pipe.fit_transform(orig)
    back = pipe.invert(tdf, Y)
    err = (
        orig.select(SERIES, DS, F.col(Y).alias("y0"))
        .join(back.select(SERIES, DS, F.col(Y).alias("y1")), [SERIES, DS])
        .select(F.max(F.abs(F.col("y0") - F.col("y1"))).alias("e"))
        .collect()[0]["e"]
    )
    assert err < 1e-6


def test_metrics_against_numpy(spark):
    a = np.array([1.0, 2.0, 3.0, 4.0])
    f = np.array([1.1, 1.9, 3.2, 4.4])
    df = spark.createDataFrame(pd.DataFrame({"actual": a, "forecast": f}))
    row = M.evaluate(df, metrics=["rmse", "mae", "mape", "r2", "smape", "bias"]).collect()[0]
    assert row["rmse"] == pytest.approx(float(np.sqrt(np.mean((f - a) ** 2))))
    assert row["mae"] == pytest.approx(float(np.mean(np.abs(f - a))))
    assert row["mape"] == pytest.approx(float(np.mean(np.abs((f - a) / a))))
    sse, sst = ((a - f) ** 2).sum(), ((a - a.mean()) ** 2).sum()
    assert row["r2"] == pytest.approx(1 - sse / sst)
    assert row["bias"] == pytest.approx(float((f - a).sum()))


def test_naive_model(tsf):
    t2 = tsf.generate_future_dates(6)
    out = naive_model(t2.df, m=3)
    pdf = out.filter(F.col(SERIES) == "click").orderBy(DS).toPandas()
    obs = pdf[pdf[IS_FUTURE] == 0]
    # in-sample = shift(3)
    assert np.allclose(
        obs["forecast"].dropna(), obs[Y].shift(3).dropna()
    )
    # future = last 3 observed tiled
    tail = obs[Y].tail(3).to_numpy()
    fut = pdf[pdf[IS_FUTURE] == 1].sort_values(DS)["forecast"].to_numpy()
    assert np.allclose(fut, np.tile(tail, 2))


def test_linear_trend_model(tsf):
    out = linear_trend_model(tsf.df)
    pdf = out.filter(F.col(SERIES) == "view").orderBy(DS).toPandas()
    t = np.arange(1, len(pdf) + 1, dtype=float)
    slope, icept = np.polyfit(t, pdf[Y].to_numpy(), 1)
    assert np.allclose(pdf["forecast"], icept + slope * t, rtol=1e-8)


def test_linear_model_recursive(tsf):
    t2 = tsf.generate_future_dates(5)
    df, names = feat.add_ar_terms(t2.df, 2)
    df, n2 = feat.add_time_trend(df)
    out = linear_model(df, names + n2)
    pdf = out.filter(F.col(SERIES) == "click").orderBy(DS).toPandas()
    obs = pdf[pdf[IS_FUTURE] == 0].dropna(subset=["ar_1", "ar_2"])
    # replicate with numpy: fit on observed rows
    X = np.column_stack([obs["ar_1"], obs["ar_2"], obs["t"], np.ones(len(obs))])
    beta, *_ = np.linalg.lstsq(X, obs[Y].to_numpy(), rcond=None)
    assert np.allclose(obs["forecast"], X @ beta, rtol=1e-6)
    # recursive future: step 1 uses real tail, later steps use predictions
    hist = list(pdf[pdf[IS_FUTURE] == 0][Y])
    fut = pdf[pdf[IS_FUTURE] == 1].sort_values(DS)
    for _, row in fut.iterrows():
        x = np.array([hist[-1], hist[-2], row["t"], 1.0])
        pred = x @ beta
        assert row["forecast"] == pytest.approx(pred, rel=1e-6)
        hist.append(pred)


def test_conformal_intervals(tsf):
    out = naive_model(tsf.df, m=1).filter(F.col("forecast").isNotNull())
    w = conformal_widths(out, actual=Y, forecast="forecast", cilevel=0.9)
    final = apply_intervals(out, w)
    pdf = final.filter(F.col(SERIES) == "error").toPandas()
    resid = np.abs(pdf["forecast"] - pdf[Y])
    expected = np.percentile(resid, 90)
    got = (pdf["upper"] - pdf["forecast"]).iloc[0]
    assert got == pytest.approx(expected, rel=1e-9)


def test_sinks_partitioned_and_bucketed(spark, sf_dir, tmp_path):
    import os

    from scalecast_spark.sources import (
        events_to_series,
        load_table,
        write_bucketed,
        write_delta,
        write_partitioned,
    )

    s = events_to_series(load_table(spark, sf_dir, "events"))
    p = str(tmp_path / "part")
    write_partitioned(s, p, ["series_id"])
    # partition layout on disk + pruned read round-trips
    assert any(d.startswith("series_id=") for d in os.listdir(p))
    back = spark.read.parquet(p)
    one = back.filter("series_id = 'click'")
    assert one.count() == s.filter("series_id = 'click'").count()
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "simple"
    )
    assert "PartitionFilters" in plan or "series_id=click" in plan

    # bucketed table: groupBy on the bucket column plans NO exchange
    # (managed table in the session warehouse; dropped below)
    write_bucketed(s, "bucketed_series", n_buckets=4)
    try:
        agg = spark.table("bucketed_series").groupBy("series_id").count()
        plan2 = agg._sc._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "simple"
        )
        assert "Exchange hashpartitioning" not in plan2
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_series")

    # gated lakehouse sinks raise a clear error without the connector
    import pytest as _pt

    with _pt.raises(RuntimeError, match="delta connector"):
        write_delta(s, str(tmp_path / "d"))
