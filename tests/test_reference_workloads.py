"""End-to-end runs of the REFERENCE's own test workload shapes
(BASELINE.md reference-parity rows), mirroring:

  * reference test/test_Forecaster.py:21-33,119-143 — one monthly
    series ~770 obs, horizon 24, test_length 48, validation 12,
    rolling CV k=2 with train_length 500, estimator sweep;
  * reference test/test_MVForecaster.py:10-26 — 3 monthly series
    2000-2022 (~274 obs), horizon 24, test 24;
  * reference test/test_Pipeline.py:18-78 — backtests with n_iter 2-5,
    jump_back 1-12, fcst_length 24, mase/msis at m=12.

These assert the WHOLE orchestration (features → tune/CV → forecast →
CIs → exports) completes with finite metrics on the reference's data
shapes — the engine-level twin of the reference's smoke suite.
"""

import math
from functools import partial

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.forecaster import Forecaster
from scalecast_spark.frame import DS, SERIES, Y


def _monthly(spark, n_series=1, n=770, start="1959-01-01", seed=7):
    rng = np.random.default_rng(seed)
    frames = []
    for s in range(n_series):
        ds = pd.date_range(start, periods=n, freq="MS")
        t = np.arange(n)
        y = (
            100 + 0.4 * t + 25 * np.sin(2 * np.pi * t / 12)
            + rng.normal(0, 6, n).cumsum() * 0.1
        )
        frames.append(pd.DataFrame({SERIES: f"m{s}", DS: ds, Y: y}))
    return spark.createDataFrame(pd.concat(frames))


def test_forecaster_workload_monthly_770(spark):
    """HOUSTNSA-shaped sweep: 770 monthly obs, horizon 24, test 48,
    validation 12, rolling CV k=2 with train_length 500."""
    f = Forecaster(_monthly(spark, 1, 770), future_dates=24)
    f.set_test_length(48)
    f.set_validation_length(12)
    f.add_ar_terms(3)
    f.add_seasonal_regressors("month", raw=False, sincos=True)
    f.add_time_trend()

    f.set_estimator("mlr")
    f.manual_forecast()
    f.set_estimator("ridge")
    f.ingest_grid({"alpha": [0.2, 2.0]})
    f.cross_validate(k=2, test_length=12, train_length=500)
    f.auto_forecast()
    f.set_estimator("hwes")
    f.manual_forecast(trend=True, seasonal=True, m=12)
    f.set_estimator("theta")
    f.manual_forecast()
    f.combo(["mlr", "ridge", "hwes", "theta"], call_me="combo")

    summ = f.export("model_summaries").toPandas()
    assert set(summ["ModelNickname"]) >= {"mlr", "ridge", "hwes", "theta", "combo"}
    rmses = summ.set_index("ModelNickname")["TestSetRMSE"]
    assert all(np.isfinite(v) for v in rmses)
    # 24 future rows per model with CI bounds
    fc = f.export("lvl_fcsts").toPandas()
    assert (fc.groupby("model").size() == 24).all()
    best = f.order_fcsts()[0]
    f.set_best_model(best)
    assert f.best_model == best


def test_mv_workload_three_series(spark):
    """UTUR/UNRATE/SAHM-shaped: 3 monthly series ~274 obs, horizon 24,
    test 24 — long format makes MV = more rows through the same kernel."""
    df = _monthly(spark, 3, 274, start="2000-01-01", seed=11)
    f = Forecaster(df, future_dates=24)
    f.set_test_length(24)
    f.add_ar_terms(2).add_time_trend()
    f.set_estimator("ridge")
    f.manual_forecast(alpha=0.5)
    fc = f.history["ridge"]["forecast"].toPandas()
    assert set(fc[SERIES]) == {"m0", "m1", "m2"}
    assert (fc.groupby(SERIES).size() == 24).all()

    from scalecast_spark.operators.multivariate import corr_matrix

    cm = corr_matrix(df).toPandas()
    assert len(cm) == 9
    diag = cm[cm["series_a"] == cm["series_b"]]["corr"]
    assert all(abs(v - 1.0) < 1e-9 for v in diag)

    # optimize_on a single series changes nothing structurally
    f.set_optimize_on("m1")
    f.ingest_grid({"alpha": [0.1, 1.0]})
    f.cross_validate(k=2, test_length=12)
    assert f.best_params["alpha"] in (0.1, 1.0)


def test_backtest_workload_m12(spark):
    """Pipeline-shaped backtest: fcst_length 24, n_iter 3, jump_back 12,
    metric table incl. mase/msis at m=12."""
    from scalecast_spark.models import naive_model
    from scalecast_spark.pipeline import backtest, backtest_metrics, msis

    series = _monthly(spark, 2, 274, start="2000-01-01", seed=3).withColumn(
        "is_future", F.lit(0)
    )
    res = backtest(
        series, {"snaive": partial(naive_model, m=12)},
        fcst_length=24, n_iter=3, jump_back=12,
    )
    counts = res.groupBy("iteration").count().toPandas()
    assert sorted(counts["iteration"]) == [0, 1, 2]
    assert (counts["count"] == 2 * 24).all()
    mt = backtest_metrics(
        res, train_df=series, m=12,
        metrics=["rmse", "smape", "mase"],
    ).toPandas()
    assert len(mt) == 4  # 3 iterations + average row
    assert np.isfinite(mt["mase"]).all()

    w = res.filter(F.col("iteration") == 1).groupBy(SERIES).agg(
        F.expr("percentile(abs(forecast - y), 0.95)").alias("_w")
    )
    r0 = (
        res.filter(F.col("iteration") == 0)
        .join(F.broadcast(w), SERIES)
        .withColumn("upper", F.col("forecast") + F.col("_w"))
        .withColumn("lower", F.col("forecast") - F.col("_w"))
    )
    ms = msis(r0, train_df=series, m=12, alpha=0.05).toPandas()
    assert np.isfinite(ms["msis"]).all()
