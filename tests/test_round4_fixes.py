"""Round-4 verdict items: bounded custom-optimizer collect, distributed
optimizer expressions, and the gated-backend sweep running end-to-end on
the numpy cores."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster


def _many_series_frame(spark, n_series=8, n_obs=30):
    rows = []
    d0 = dt.date(2024, 1, 1)
    for s in range(n_series):
        for i in range(n_obs):
            rows.append(
                (f"s{s}", d0 + dt.timedelta(days=i), float(10 + s + i % 7), 0)
            )
    return spark.createDataFrame(
        rows, schema="series_id string, ds date, y double, is_future int"
    )


def _tuned(f):
    f.set_test_length(5)
    f.set_validation_length(5)
    f.set_estimator("ridge")
    f.add_ar_terms([1, 2])
    f.ingest_grid({"alpha": [0.0, 0.1]})
    return f


def test_custom_optimizer_collect_is_bounded(spark):
    """A callable optimizer must NOT silently pull one row per series
    at unbounded scale — above max_optimizer_collect tuning refuses."""
    f = _tuned(Forecaster(_many_series_frame(spark), future_dates=5))
    f.add_optimizer_func(lambda vals: float(np.median(vals)), called="med")
    f.set_optimize_on("med")
    f.max_optimizer_collect = 3  # 8 series > 3 → fail loudly
    with pytest.raises(RuntimeError, match="add_optimizer_expr"):
        f.tune()


def test_custom_optimizer_under_cap_still_works(spark):
    f = _tuned(Forecaster(_many_series_frame(spark), future_dates=5))
    f.add_optimizer_func(lambda vals: float(np.median(vals)), called="med")
    f.set_optimize_on("med")
    f.tune()  # default cap is far above 8 series
    assert f.best_params is not None


def test_optimizer_expr_is_distributed_and_correct(spark):
    """add_optimizer_expr: Spark-side aggregate, one driver row. The
    p100 percentile expression must equal the built-in 'max' decision."""
    df = _many_series_frame(spark)
    f1 = _tuned(Forecaster(df, future_dates=5))
    f1.add_optimizer_expr(
        lambda c: F.expr(f"percentile({c}, 1.0)"), called="p100"
    )
    f1.set_optimize_on("p100")
    f1.tune()
    f2 = _tuned(Forecaster(df, future_dates=5))
    f2.set_optimize_on("max")
    f2.tune()
    assert f1.best_params == f2.best_params


def test_gated_backend_sweep_runs_on_numpy_cores(spark):
    """prophet/tbats/rnn/lstm call sites are import-gated on packages
    absent from this container; the sweep must still complete on the
    numpy cores under error='warn' and produce real forecasts."""
    from scalecast_spark.selection import tune_test_forecast

    f = Forecaster(_many_series_frame(spark, n_series=2, n_obs=40),
                   future_dates=4)
    f.set_test_length(5)
    f.set_validation_length(5)
    tune_test_forecast(
        f, models=["prophet", "tbats", "rnn", "lstm"], error="warn"
    )
    for m in ("prophet", "tbats", "rnn", "lstm"):
        assert m in f.history, f"{m} missing from history"
        fc = f.history[m]["forecast"]
        assert fc.filter(F.col("forecast").isNotNull()).count() > 0


def test_arima_default_ignores_feature_columns(spark):
    """Reference semantics (models.py:432): plain arima with Xvars
    unspecified uses NO exog — feature columns with NULL warm-up rows
    (ar lags) must not poison the fit."""
    f = Forecaster(_many_series_frame(spark, n_series=2, n_obs=40), future_dates=5)
    f.set_test_length(5)
    f.add_ar_terms([1, 2])  # NULL on first rows and on future rows
    f.set_estimator("arima")
    f.manual_forecast(order=(1, 0, 0))
    out = f.export("lvl_fcsts").toPandas()
    assert len(out) == 10 and out["forecast"].notna().all()
    assert (out["model"] == "arima").all()
    # explicit Xvars='all' still opts in (fails loudly on NaN exog is
    # acceptable; here trend-only exog keeps it clean)
    f2 = Forecaster(_many_series_frame(spark, n_series=2, n_obs=40), future_dates=5)
    f2.set_test_length(5)
    f2.add_time_trend()
    f2.set_estimator("arima")
    f2.manual_forecast(order=(1, 0, 0), Xvars="all")
    assert f2.export("lvl_fcsts").toPandas()["forecast"].notna().all()


def test_lstm_accepts_cell_kwarg(spark):
    """A tuning grid that carries cell= must not TypeError against the
    lstm alias (which pins cell='lstm')."""
    from scalecast_spark.models.mlp import lstm_model

    f = Forecaster(_many_series_frame(spark, n_series=1, n_obs=30), future_dates=3)
    df, feats = f.tsf.df, []
    out = lstm_model(
        df, feats, lags=4, hidden=4, epochs=5, horizon=3, cell="lstm"
    )
    assert out.filter(F.col("is_future") == 1).count() == 3


def test_image_features_null_payload_survives(spark):
    from scalecast_spark.datapipe.multimodal import extract_image_features, fake_decode

    df = spark.createDataFrame(
        [(1, bytearray(b"ok-payload")), (2, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["feat"] for r in
           extract_image_features(df, decode=fake_decode).collect()}
    assert got[1] is not None and len(got[1]) == 6
    assert got[2] is None


def test_hannan_rissanen_short_series_fails_loudly():
    from scalecast_spark.models.arima import _hannan_rissanen

    with pytest.raises(ValueError, match="too short"):
        _hannan_rissanen(np.array([1.0, 2.0, 1.5]), 0, 1)


def test_default_xgb_catboost_grids_stay_on_batched_cv_path(spark):
    """DEFAULT_GRIDS cells carry reg_lambda/gamma — the kernel
    factories must accept them, or tuning silently falls off the
    one-job CV path into |grid|*k separate jobs."""
    from scalecast_spark.grids import get_example_grids

    for est in ["xgboost", "catboost"]:
        f = _tuned(Forecaster(_many_series_frame(spark), future_dates=5))
        f.set_estimator(est)
        f.ingest_grid(get_example_grids()[est])
        cells = f._grid_cells(dynamic_tuning=False)
        assert cells is not None and len(cells) == len(f.grid)
        assert all(callable(c[0]) for c in cells)
