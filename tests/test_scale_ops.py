"""Rolling stats, EWMA, salted aggregation, Forecaster slicing/MV API."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.operators.features import add_ewma, add_rolling_stats
from scalecast_spark.operators.skew import salted_agg
from scalecast_spark.sources import load_table, events_to_series


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    return events_to_series(load_table(spark, sf_dir, "events")).cache()


def test_rolling_stats_match_pandas(series):
    df, names = add_rolling_stats(series, 7)
    pdf = df.filter(F.col(SERIES) == "click").orderBy(DS).toPandas()
    exp = pdf[Y].shift(1).rolling(7, min_periods=1).std()
    got = pdf["rolling_std_7"]
    mask = got.notna() & exp.notna()
    assert np.allclose(got[mask], exp[mask])


def test_ewma_matches_pandas(series):
    df, _ = add_ewma(series, alpha=0.3)
    pdf = df.filter(F.col(SERIES) == "view").orderBy(DS).toPandas()
    exp = pdf[Y].shift(1).ewm(alpha=0.3, adjust=True).mean()
    got = pdf["ewma_0_3"]
    mask = got.notna()
    assert np.allclose(got[mask], exp[mask], rtol=1e-3)


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_agg(ev, ["event_type"], {"value": "sum", "event_id": "count"},
                        n_salts=8).orderBy("event_type").collect()
    plain = (
        ev.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count("event_id").alias("c"))
        .orderBy("event_type").collect()
    )
    for a, b in zip(salted, plain):
        assert a["sum_value"] == pytest.approx(b["s"])
        assert a["count_event_id"] == b["c"]


def test_forecaster_slicing_and_round(series):
    f = Forecaster(series)
    n0 = f.tsf.observed.count()
    f.chop_from_front(2)
    assert f.tsf.observed.count() == n0 - 2 * 5
    f.round(0)
    vals = f.tsf.df.select(Y).limit(5).collect()
    assert all(r[Y] == int(r[Y]) for r in vals)


def test_optimize_on_changes_selection(series):
    f = Forecaster(series, future_dates=7)
    f.set_estimator("naive")
    f.ingest_grid({"m": [1, 7]})
    f.set_optimize_on("max")  # worst-series metric
    f.cross_validate(k=2, test_length=5)
    worst = f.validation_metric_value
    f.set_optimize_on("mean")
    f.cross_validate(k=2, test_length=5)
    mean = f.validation_metric_value
    assert worst >= mean  # max-aggregated score can't beat the mean


def test_set_best_model(series):
    f = Forecaster(series, future_dates=7)
    f.set_test_length(7)
    f.set_estimator("naive"); f.manual_forecast(m=1, call_me="n1")
    f.set_estimator("naive"); f.manual_forecast(m=7, call_me="n7")
    f.set_best_model(determine_best_by="TestSetRMSE")
    assert f.best_model in ("n1", "n7")
