"""add_signals, Pipeline.fit_predict, synthesize_models, validation grid export."""

import pytest
from functools import partial
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.pipeline import Pipeline, Transformer, Reverter
from scalecast_spark.operators import transforms as tr
from scalecast_spark.models import MODELS
from scalecast_spark.sources import load_table, events_to_series


@pytest.fixture()
def f(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    fc = Forecaster(series, future_dates=7)
    fc.set_test_length(7)
    fc.add_ar_terms(2)
    return fc


def test_add_signals(f):
    f.set_estimator("naive")
    f.manual_forecast(m=7, call_me="snaive")
    f.add_signals(["snaive"])
    assert "signal_snaive" in f.get_regressor_names()
    # signal present on future rows too (from the model's forecast)
    fut = f.tsf.df.filter(
        (F.col("is_future") == 1) & F.col("signal_snaive").isNotNull()
    )
    assert fut.count() == 7 * 5
    # and usable as a regressor
    f.set_estimator("mlr")
    f.manual_forecast(Xvars=["signal_snaive"], call_me="mlr_on_signal")
    assert f.history["mlr_on_signal"]["summary"]["TestSetRMSE"] > 0


def test_pipeline_fit_predict(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events")).withColumn(
        "is_future", F.lit(0)
    )
    t = Transformer([tr.LogTransform()])
    pipe = Pipeline([
        ("log", t),
        ("model", partial(MODELS["naive"], m=7)),
        ("revert", Reverter(t)),
    ])
    out = pipe.fit_predict(series)
    pdf = out.filter(F.col("forecast").isNotNull()).toPandas()
    assert len(pdf) > 0
    assert pdf["forecast"].max() > 50  # level scale after revert


def test_synthesize_models(f):
    f.set_estimator("naive"); f.manual_forecast(m=1, call_me="n1")
    f.set_estimator("naive"); f.manual_forecast(m=7, call_me="n7")
    f.set_estimator("theta"); f.manual_forecast(call_me="theta")
    f.synthesize_models(["n1", "n7", "theta"], call_me="synth")
    fc = f.history["synth"]["forecast"]
    rows = fc.collect()
    assert len(rows) == 7 * 5
    for r in rows[:5]:
        assert r["lower"] <= r["forecast"] <= r["upper"]


def test_validation_grid_export(f):
    f.set_estimator("naive")
    f.ingest_grid({"m": [1, 7]})
    f.cross_validate(k=2, test_length=5)
    grid = f.export("validation_grid").collect()
    assert len(grid) == 4  # 2 params x 2 folds
    assert all(r["metric"] > 0 for r in grid)
