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


# ---------------------------------------------------------------------------
# Introduction2.ipynb transliteration (r12 verdict #6): the reference's
# full docs tour — avocado-shaped weekly volume/price series — condensed
# to the API-shape-bearing cells. Each part exercises call shapes the
# reference's own tests do NOT cover (fractional test_length, eval_cis,
# export(models=, cis=), SeriesTransformer method API, tuple-spec
# Transformer/Reverter, Forecaster-mode pipelines, pipeline.backtest
# with models= forwarding, MVPipeline combine->break, GridGenerator).
# ---------------------------------------------------------------------------


def _weekly(spark, col="volume", n=150, seed=11):
    rng = np.random.default_rng(seed)
    ds = pd.date_range("2021-01-03", periods=n, freq="W")
    t = np.arange(n)
    if col == "volume":
        y = 900 + 3.0 * t + 120 * np.sin(2 * np.pi * t / 52) + rng.normal(0, 25, n)
    else:
        y = 1.4 - 0.001 * t + 0.2 * np.cos(2 * np.pi * t / 52) + rng.normal(0, 0.03, n)
    return spark.createDataFrame(pd.DataFrame({SERIES: col, DS: ds, Y: y}))


def test_intro2_estimator_sweep_and_exports(spark):
    """Cells 7-50 + 150-152: fractional test split, eval_cis, the
    sklearn sweep with dynamic_testing, scalecast-stack via
    add_signals, and the dict export with models=/cis=."""
    from scalecast_spark.forecaster import Forecaster

    f = Forecaster(_weekly(spark), future_dates=13)
    f.set_test_length(.15)
    assert f.test_length == int(150 * .15)
    f.eval_cis(mode=True, cilevel=.95)
    f.add_time_trend()
    f.add_seasonal_regressors("week", raw=False, sincos=True)
    f.add_ar_terms(13)
    for est, kw in [
        ("mlr", {}),
        ("lasso", {"alpha": 0.2}),
        ("ridge", {"alpha": 0.2}),
        ("elasticnet", {"alpha": 0.2, "l1_ratio": 0.5}),
        ("knn", {"n_neighbors": 5}),
        ("gbt", {"max_depth": 2}),
    ]:
        f.set_estimator(est)
        f.manual_forecast(dynamic_testing=13, **kw)
    # scalecast stack (cell 48)
    f.add_signals(["elasticnet", "knn"])
    f.set_estimator("mlr")
    f.manual_forecast(call_me="scalecast_stack")
    order = f.order_fcsts("TestSetRMSE")
    assert set(order) >= {"mlr", "lasso", "ridge", "elasticnet", "knn"}
    # cells 150-152: dict export filtered by models, with CI columns
    results = f.export(
        ["model_summaries", "lvl_fcsts"], cis=True,
        models=["mlr", "lasso", "ridge"],
    )
    assert set(results) == {"model_summaries", "lvl_fcsts"}
    ms = results["model_summaries"].toPandas()
    assert sorted(ms["ModelNickname"]) == ["lasso", "mlr", "ridge"]
    assert {"ModelNickname", "HyperParams"} <= set(ms.columns)
    fc = results["lvl_fcsts"]
    assert {"upper", "lower"} <= set(fc.columns)
    assert fc.count() == 3 * 13


def test_intro2_seriestransformer_roundtrip(spark):
    """Cells 87-99: DiffTransform(1) + DiffTransform(52) +
    DetrendTransform, model, then reverts in reverse order — series
    round-trips exactly and history metrics recompute at level."""
    from scalecast_spark.forecaster import Forecaster
    from scalecast_spark.series_transformer import SeriesTransformer

    f = Forecaster(_weekly(spark), future_dates=13)
    f.set_test_length(.15)
    f.set_validation_length(13)
    t = SeriesTransformer(f)
    f = t.DiffTransform(1)
    f = t.DiffTransform(52)
    f = t.DetrendTransform()
    f.add_time_trend()
    f.add_seasonal_regressors("week", sincos=True, raw=False)
    f.add_ar_terms(4)
    f.set_estimator("gbt")
    f.manual_forecast(max_depth=2, dynamic_testing=13)
    rmse_transformed = f.history["gbt"]["summary"]["TestSetRMSE"]
    f = t.DetrendRevert()
    f = t.DiffRevert(52)
    f = t.DiffRevert(1)
    rmse_level = f.history["gbt"]["summary"]["TestSetRMSE"]
    assert rmse_level != rmse_transformed and math.isfinite(rmse_level)
    got = (
        f.tsf.df.filter("is_future=0").orderBy(DS).select(Y).toPandas()[Y]
    ).to_numpy()
    raw = _weekly(spark).orderBy(DS).select(Y).toPandas()[Y].to_numpy()
    # diff(1)+diff(52) drop 53 prefix rows; the rest must round-trip
    assert np.abs(got - raw[53:]).max() < 1e-8
    fc = f.history["gbt"]["forecast"]
    assert fc.count() == 13
    assert all(r["forecast"] is not None for r in fc.collect())
    # wrong-order revert raises
    with pytest.raises(ValueError, match="un-reverted"):
        t.DiffRevert(52)


def test_intro2_pipeline_fit_predict_and_backtest(spark):
    """Cells 101-125: tuple-spec Transformer/Reverter, a forecaster(f)
    model step, Forecaster-mode fit_predict returning the object, and
    pipeline.backtest with models= forwarding + backtest_metrics."""
    from scalecast_spark.forecaster import Forecaster
    from scalecast_spark.pipeline import (
        Pipeline, Reverter, Transformer, backtest_metrics,
    )
    from scalecast_spark.selection import tune_test_forecast

    transformer = Transformer(
        transformers=[("DiffTransform", 1), ("DetrendTransform",)]
    )
    reverter = Reverter(
        reverters=[("DetrendRevert",), ("DiffRevert", 1)],
        base_transformer=transformer,
    )

    def forecaster(f, models):
        f.add_time_trend()
        f.add_ar_terms(4)
        tune_test_forecast(
            f, models,
            grids={"mlr": {"normalizer": [None]},
                   "ridge": {"alpha": [0.1, 1.0]}},
            error="raise",
        )

    f_pipe = Forecaster(_weekly(spark), future_dates=13)
    f_pipe.set_test_length(.15)
    f_pipe.set_validation_length(13)
    pipeline = Pipeline(steps=[
        ("Transform", transformer),
        ("Forecast", forecaster),
        ("Revert", reverter),
    ])
    f_pipe = pipeline.fit_predict(f_pipe, models=["mlr", "ridge"])
    assert sorted(f_pipe.history) == ["mlr", "ridge"]
    assert f_pipe.history["mlr"]["forecast"].count() == 13

    # cells 123-125: whole-pipeline backtest, fcst_length='auto' from
    # the horizon, metrics straight from the result frame
    bt = pipeline.backtest(
        f_pipe, n_iter=2, jump_back=13, cis=False,
        models=["mlr", "ridge"],
    )
    rows = bt.collect()
    assert len(rows) == 2 * 2 * 13  # models x iterations x horizon
    assert all(r[Y] is not None and r["forecast"] is not None for r in rows)
    mets = backtest_metrics(bt, mets=["smape", "rmse", "bias"]).toPandas()
    assert set(mets["model"]) == {"mlr", "ridge"}


def test_intro2_mvforecaster_flow(spark):
    """Cells 57-85: MVForecaster construction with names, corr_lags,
    set_optimize_on, the sklearn estimator with lags=, mlp_stack,
    set_best_model, break_mv_forecaster."""
    from scalecast_spark.forecaster import (
        Forecaster, MVForecaster, break_mv_forecaster,
    )
    from scalecast_spark.selection import mlp_stack

    fvol = Forecaster(_weekly(spark, "volume"), future_dates=13)
    fprice = Forecaster(_weekly(spark, "price"), future_dates=13)
    fvol.add_time_trend()
    mvf = MVForecaster(fvol, fprice, merge_Xvars="union",
                       names=["volume", "price"])
    mvf.set_test_length(.15)
    mvf.set_optimize_on("volume")
    corr = mvf.corr_lags("volume", "price", lags=6)
    assert corr.count() == 6
    mvf.set_estimator("elasticnet")
    assert mvf.estimator == "mv_elasticnet"  # reference name -> MV twin
    mvf.manual_forecast(alpha=0.2, lags=13, dynamic_testing=13)
    mlp_stack(mvf, models=["mv_elasticnet"])
    mvf.set_best_model(determine_best_by="TestSetRMSE")
    fvol2, fprice2 = break_mv_forecaster(mvf)
    for fx, sid in [(fvol2, "price"), (fprice2, "volume")]:
        pass  # order is sorted(series): price, volume
    parts = dict(zip(["price", "volume"], break_mv_forecaster(mvf)))
    for sid, fx in parts.items():
        assert fx.tsf.series_ids() == [sid]
        assert "mv_elasticnet" in fx.history
        assert fx.history["mv_elasticnet"]["forecast"].count() == 13


def test_intro2_mvpipeline_fit_predict_and_backtest(spark):
    """Cells 127-138: GridGenerator.get_mv_grids, MVPipeline with
    per-series transformers + add-vars steps + a combined
    mvforecaster(mvf, models) step + per-series reverters; then the
    whole-composition MV backtest with test_length=0/cis=False."""
    from scalecast_spark import grids as GridGenerator
    from scalecast_spark.forecaster import Forecaster
    from scalecast_spark.pipeline import (
        MVPipeline, Reverter, Transformer, backtest_metrics,
    )
    from scalecast_spark.selection import tune_test_forecast

    mv_grids = GridGenerator.get_mv_grids(overwrite=True)
    # lags axis only where an MV twin exists — series kernels
    # (hwes/theta) have no lags knob
    assert "lags" in mv_grids["mlr"] and "lags" in mv_grids["ridge"]
    assert "lags" not in mv_grids.get("hwes", {})

    t_vol = Transformer(transformers=[("DetrendTransform",)])
    t_price = Transformer(transformers=[("DetrendTransform",)])

    def add_vars(f, **kwargs):
        f.add_seasonal_regressors("month", raw=False, sincos=True)

    def mvforecaster(mvf, models):
        mvf.set_optimize_on("volume")
        tune_test_forecast(
            mvf, models,
            grids={"mlr": {"lags": [2, 4]}},
            error="raise",
        )

    fvol = Forecaster(_weekly(spark, "volume"), future_dates=13,
                      test_length=20)
    fprice = Forecaster(_weekly(spark, "price"), future_dates=13,
                        test_length=20)
    mvpipeline = MVPipeline(
        steps=[
            ("Transform", [t_vol, t_price]),
            ("Add Xvars", [add_vars] * 2),
            ("Forecast", mvforecaster),
            ("Revert", [Reverter(t_vol), Reverter(t_price)]),
        ],
        test_length=20,
        cis=True,
        names=["volume", "price"],
    )
    fvol, fprice = mvpipeline.fit_predict(fvol, fprice, models=["mlr"])
    for fx, sid in [(fvol, "volume"), (fprice, "price")]:
        assert fx.tsf.series_ids() == [sid]
        assert fx.history["mlr"]["forecast"].count() == 13
        assert math.isfinite(fx.history["mlr"]["summary"]["TestSetRMSE"])

    # cells 136-138: MV backtest on fresh objects
    fvol_bt = Forecaster(_weekly(spark, "volume"), future_dates=13)
    fprice_bt = Forecaster(_weekly(spark, "price"), future_dates=13)
    bt = mvpipeline.backtest(
        fvol_bt, fprice_bt, n_iter=2, jump_back=13,
        test_length=0, cis=False, models=["mlr"],
    )
    rows = bt.collect()
    assert len(rows) == 2 * 2 * 13  # series x iterations x horizon
    assert all(r[Y] is not None for r in rows)
    mets = backtest_metrics(
        bt, mets=["smape", "rmse", "bias"], names=["Volume", "Price"]
    )
    assert mets.count() > 0


def test_intro2_find_optimal_transformation_pair(spark):
    """Cell 116: the reference call shape returning a
    (Transformer, Reverter) pair pluggable into a Pipeline."""
    from scalecast_spark.forecaster import Forecaster
    from scalecast_spark.pipeline import Pipeline, Reverter, Transformer
    from scalecast_spark.transform_search import find_optimal_transformation

    f = Forecaster(_weekly(spark), future_dates=13)
    f.set_test_length(.15)
    transformer, reverter = find_optimal_transformation(
        f, lags=13, m=52, monitor="mae", estimator="elasticnet",
        alpha=0.2, test_length=13, num_test_sets=3,
        space_between_sets=4, verbose=True,
    )
    assert isinstance(transformer, Transformer)
    assert isinstance(reverter, Reverter) and reverter.base is transformer

    def forecaster(f):
        f.add_ar_terms(4)
        f.set_estimator("mlr")
        f.manual_forecast()

    pipe = Pipeline(steps=[
        ("Transform", transformer),
        ("Forecast", forecaster),
        ("Revert", reverter),
    ])
    f = pipe.fit_predict(f)
    assert f.history["mlr"]["forecast"].count() == 13
