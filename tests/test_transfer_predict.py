"""transfer_predict (reference _Forecaster_parent.py:1869-1943): a
model trained on one Forecaster's data predicts ANOTHER object's
series without retraining — model-as-data via the cogrouped
transfer_kernel (fit-on-src / apply-on-dst in one Arrow task)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.models import KERNEL_FACTORIES
from scalecast_spark.models.kernel import run_kernel, transfer_kernel
from scalecast_spark.sources import events_to_series, load_table


@pytest.fixture(scope="module")
def pair(spark, sf_dir):
    """Source = full history; target = the same series chopped by 14
    days (so the transferred model sees data the target never
    trained on — the canonical transfer scenario)."""
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f_src = Forecaster(series, future_dates=7)
    f_src.set_test_length(7)
    f_src.add_ar_terms(2).add_time_trend()
    cutoff = series.agg(F.date_sub(F.max("ds"), 14)).collect()[0][0]
    f_dst = Forecaster(series.filter(F.col("ds") <= cutoff), future_dates=7)
    f_dst.set_test_length(7)
    f_dst.add_ar_terms(2).add_time_trend()
    return f_src, f_dst


def test_transfer_kernel_same_data_equals_run_kernel(spark, sf_dir):
    """Transferring onto the SAME frame the model was fit on must
    reproduce run_kernel exactly (same fit, same recursion)."""
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=7)
    f.add_ar_terms(2).add_time_trend()
    feats = list(f.tsf.features)
    fit = KERNEL_FACTORIES["ridge"](alpha=1.0)
    a = (
        run_kernel(f.tsf.df, feats, fit, normalizer=None)
        .filter("is_future = 1").orderBy("series_id", "ds")
        .select("series_id", "ds", "forecast").collect()
    )
    b = (
        transfer_kernel(f.tsf.df, f.tsf.df, feats, fit, normalizer=None)
        .filter("is_future = 1").orderBy("series_id", "ds")
        .select("series_id", "ds", "forecast").collect()
    )
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_transfer_uses_source_parameters(pair):
    """The transferred forecast must differ from the target's own fit
    (different training data -> different parameters) while covering
    every future row."""
    f_src, f_dst = pair
    f_src.set_estimator("mlr").manual_forecast()
    f_dst.set_estimator("mlr").manual_forecast(call_me="own_fit")
    f_dst.transfer_predict(f_src, "mlr", call_me="from_src")
    own = {
        (r["series_id"], r["ds"]): r["forecast"]
        for r in f_dst.history["own_fit"]["forecast"].collect()
    }
    got = {
        (r["series_id"], r["ds"]): r["forecast"]
        for r in f_dst.history["from_src"]["forecast"].collect()
    }
    assert set(got) == set(own)  # same horizon grid
    assert all(v is not None and np.isfinite(v) for v in got.values())
    assert got != own  # source-trained parameters, not a re-fit
    summ = f_dst.history["from_src"]["summary"]
    assert summ["transferred_from"] == "mlr"
    assert summ["TestSetRMSE"] > 0  # evaluated on the TARGET's test span


def test_transfer_ranks_alongside_native_models(pair):
    f_src, f_dst = pair
    if "mlr" not in f_src.history:
        f_src.set_estimator("mlr").manual_forecast()
    if "own_fit" not in f_dst.history:
        f_dst.set_estimator("mlr").manual_forecast(call_me="own_fit")
    if "from_src" not in f_dst.history:
        f_dst.transfer_predict(f_src, "mlr", call_me="from_src")
    order = f_dst.order_fcsts("TestSetRMSE")
    assert set(order) >= {"own_fit", "from_src"}


def test_transfer_validation_errors(pair):
    f_src, f_dst = pair
    with pytest.raises(ValueError, match="not evaluated"):
        f_dst.transfer_predict(f_src, "nope")
    if "mlr" not in f_src.history:
        f_src.set_estimator("mlr").manual_forecast()
    bare = Forecaster(
        f_dst.tsf.df.select("series_id", "ds", "y", "is_future"),
        future_dates=0,
    )
    # feature columns missing on the target -> clear recipe error
    with pytest.raises(ValueError, match="feature columns"):
        bare.transfer_predict(f_src, "mlr")


def test_transfer_non_kernel_estimator_rejected(pair):
    f_src, f_dst = pair
    f_src.set_estimator("hwes").manual_forecast()
    with pytest.raises(ValueError, match="kernel estimator family"):
        f_dst.transfer_predict(f_src, "hwes")
