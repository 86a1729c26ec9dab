"""Forecaster API tests, mirroring the reference suite's flow
(test/test_Forecaster.py: feature gen → tune/CV → forecast → export)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.sources import load_table, events_to_series


@pytest.fixture()
def f(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    fc = Forecaster(series, future_dates=7)
    fc.set_test_length(7)
    fc.add_ar_terms(2).add_time_trend().add_seasonal_regressors(
        "dayofweek", raw=False, sincos=True
    )
    return fc

def test_feature_surface(f):
    names = f.get_regressor_names()
    assert "ar_1" in names and "t" in names and "dayofweeksin1" in names
    f.drop_Xvars("dayofweeksin2", "dayofweekcos2")
    assert "dayofweeksin2" not in f.get_regressor_names()


def test_naive_and_mlr_history(f):
    f.set_estimator("naive").manual_forecast(m=7, call_me="snaive")
    f.set_estimator("mlr").manual_forecast()
    assert set(f.history) == {"snaive", "mlr"}
    summ = {r["ModelNickname"]: r for r in f.export("model_summaries").collect()}
    assert summ["mlr"]["TestSetRMSE"] > 0
    assert summ["snaive"]["InSampleMAE"] > 0
    fcsts = f.export("lvl_fcsts")
    # horizon rows per model per series
    counts = fcsts.groupBy("model").count().collect()
    assert all(r["count"] == 7 * 5 for r in counts)
    # CIs attached when test_length > 0
    assert {"upper", "lower"} <= set(f.history["mlr"]["forecast"].columns)


def test_order_and_combo(f):
    f.set_estimator("naive").manual_forecast(m=7, call_me="snaive")
    f.set_estimator("mlr").manual_forecast()
    order = f.order_fcsts("TestSetRMSE")
    assert set(order) == {"snaive", "mlr"}
    f.combo(["snaive", "mlr"], call_me="avg")
    avg = f.history["avg"]["forecast"]
    joined = (
        f.history["snaive"]["forecast"].select("series_id", "ds", F.col("forecast").alias("a"))
        .join(f.history["mlr"]["forecast"].select("series_id", "ds", F.col("forecast").alias("b")),
              ["series_id", "ds"])
        .join(avg.select("series_id", "ds", F.col("forecast").alias("c")), ["series_id", "ds"])
    )
    row = joined.limit(3).collect()
    for r in row:
        assert r["c"] == pytest.approx((r["a"] + r["b"]) / 2, rel=1e-9)


def test_cross_validate_selects_params(f):
    f.set_estimator("naive")
    f.ingest_grid({"m": [1, 7]})
    f.cross_validate(k=2, test_length=5)
    assert f.best_params in ({"m": 1}, {"m": 7})
    assert f.validation_metric_value is not None and f.validation_metric_value > 0
    f.auto_forecast(call_me="naive_cv")
    assert "naive_cv" in f.history


def test_grid_limit():
    from scalecast_spark.forecaster import Forecaster as FC

    grid = {"a": [1, 2, 3], "b": [True, False]}
    f = FC.__new__(FC)
    f.grid = None
    f.ingest_grid(grid)
    assert len(f.grid) == 6
    f.limit_grid_size(3, random_seed=42)
    assert len(f.grid) == 3
    f.ingest_grid(grid)
    f.limit_grid_size(0.5, random_seed=1)
    assert len(f.grid) == 3


def test_export_to_excel_fallback(f, tmp_path):
    """Workbook export degrades to a CSV directory when no xlsx writer
    is installed (reference Forecaster.py:2065-2219 surface)."""
    import os

    f.set_estimator("naive").manual_forecast(m=7)
    out = f.export_to_excel(str(tmp_path / "results.xlsx"))
    assert os.path.exists(out)
    if os.path.isdir(out):  # container path: no openpyxl/xlsxwriter
        names = sorted(os.listdir(out))
        assert names == ["lvl_fcsts.csv", "model_summaries.csv"]
        import pandas as pd

        summ = pd.read_csv(os.path.join(out, "model_summaries.csv"))
        assert "ModelNickname" in summ.columns
