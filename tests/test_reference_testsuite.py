"""Transliteration of the REFERENCE'S OWN TEST SUITE
(/root/reference/test/*.py, 580 lines) — the round-14 second
docs-surface pass (after round 13's Introduction2.ipynb). Each test
mirrors one reference test function's call shapes on the engine's
long-frame model; engine-vs-reference naming divergences are asserted
AS the engine names them and noted inline.

Covered here:
  * test_Forecaster.py test_add_terms / test_statistical_tests /
    test_modeling (trimmed) / test_transfer_modeling
  * test_GridGenerator.py main
  * test_SeriesTransformer.py main (transform->model->revert loop)
  * test_util.py main (Forecaster_with_missing_vals)
  * ForecasterGlobals.ipynb attribute walk
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster, GridGenerator, MVForecaster
from scalecast_spark.auxmodels import auto_arima, mlp_stack
from scalecast_spark.classes import AR, MetricStore
from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y
from scalecast_spark.util import (
    Forecaster_with_missing_vals,
    infer_apply_Xvar_selection,
    metrics,
)


def _houst_like(spark, n=240, seed=7, future_dates=24, test_length=48,
                cis=False):
    """A monthly series in the shape of the reference's HOUSTNSA
    fixture (reference test_Forecaster.py:10-32 build_Forecaster):
    trend + annual seasonality + noise, built through the reference
    ctor call shape (y= / current_dates= arrays)."""
    rng = np.random.default_rng(seed)
    dates = pd.date_range("2000-01-01", periods=n, freq="MS")
    y = (
        80
        + 0.05 * np.arange(n)
        + 12 * np.sin(2 * np.pi * np.arange(n) / 12)
        + rng.normal(0, 4, n)
    )
    return Forecaster(
        y=y, current_dates=dates, future_dates=future_dates,
        test_length=test_length, cis=cis,
    )


# -------------------------------------------------- test_add_terms
def test_add_terms(spark):
    """reference test_Forecaster.py:34-85. Engine naming divergences
    (deliberate, frame-column-safe): AR lags are ar_<k> (AR() tokens
    compare equal to both spellings), logged terms ln_<c>/log10_<c>
    vs lnt/log10t, lags <c>_lag_<k> vs <c>lag_<k>, exp powers round
    to 2dp with '_' replacing the decimal point (t^0_51 — '.' in a
    column name parses as a struct path)."""
    f = _houst_like(spark)
    f.add_AR_terms((2, 12))
    assert AR(24) in f.get_regressor_names()

    f.add_ar_terms(12)
    assert AR(12) in f.get_regressor_names()

    f.drop_all_Xvars()
    f.add_ar_terms([12, 24])
    names = f.get_regressor_names()
    assert AR(12) in names and AR(24) in names
    assert AR(1) not in names

    f.add_time_trend()
    assert "t" in f.get_regressor_names()

    f.add_covid19_regressor()
    assert "COVID19" in f.get_regressor_names()

    f.add_other_regressor(called="other", start="2021-01-01", end="2021-06-30")
    assert "other" in f.get_regressor_names()

    f.add_combo_regressors("t", "COVID19")
    assert "t_COVID19" in f.get_regressor_names()

    f.add_lagged_terms("t")
    assert "t_lag_1" in f.get_regressor_names()  # reference: tlag_1

    f.add_logged_terms("t")
    assert "ln_t" in f.get_regressor_names()  # reference: lnt

    f.add_logged_terms("t", base=10)
    assert "log10_t" in f.get_regressor_names()  # reference: log10t

    f.add_pt_terms("t")
    assert "t_pt" in f.get_regressor_names()  # reference: box-cox_t

    f.add_seasonal_regressors(
        "month", sincos=True, dummy=True, cycle_lens={"month": 12}
    )
    names = f.get_regressor_names()
    assert "month" in names
    assert any(str(n).startswith("monthsin") for n in names)
    assert "month_12" in names

    f.add_poly_terms("t", pwr=3)
    assert "t^3" in f.get_regressor_names()

    f.add_exp_terms("t", pwr=0.509)
    assert "t^0_51" in f.get_regressor_names()  # reference: t^0.51


# ------------------------------------------- test_statistical_tests
def test_statistical_tests(spark):
    """reference test_Forecaster.py:92-97."""
    f = _houst_like(spark)
    res = f.adf_test()
    assert set(res) >= {"adf_stat", "used_lag", "stationary"}
    assert isinstance(f.adf_test(full_res=False), bool)
    assert isinstance(f.adf_test(diffy=True, full_res=False), bool)
    stat, pval = f.normality_test()
    assert np.isfinite(stat) and 0.0 <= pval <= 1.0
    stat_d, pval_d = f.normality_test(diffy=True)
    assert np.isfinite(stat_d)


# ------------------------------------------------- test_modeling
@pytest.mark.parametrize("tl", [0, 36])
def test_modeling(spark, tmp_path, monkeypatch, tl):
    """reference test_Forecaster.py:99-194 trimmed to the engine's
    fast estimators (elasticnet/gbt for the tuned pair; the reference
    list adds catboost/arima/hwes/rnn/lstm — those run in their own
    lanes). Exercises: grids-file contract, custom metric via
    MetricStore, rolling CV kwargs through tune_test_forecast,
    signals with bfill/None/train_only, estimator-shaped combo with
    top_N weighting, seasonal naive, mlp_stack, auto_arima, exports."""
    from pyspark.sql import functions as F  # noqa: F401

    GridGenerator.get_grids(
        "example", out_name=str(tmp_path / "ExampleGrids.py"), overwrite=True
    )
    monkeypatch.syspath_prepend(str(tmp_path))

    f = _houst_like(spark, n=160, test_length=tl)
    rmse_mae = MetricStore(
        name="rmse_mae",
        expr=lambda a, f_: (
            F.sqrt(F.avg(F.pow(F.col(f_) - F.col(a), 2)))
            + F.avg(F.abs(F.col(f_) - F.col(a)))
        ) / 2,
    )
    f.set_metrics(["rmse", "smape", rmse_mae])
    assert "rmse_mae" in f.metrics
    f.set_grids_file("ExampleGrids")
    f.set_validation_metric("rmse_mae")
    f.set_validation_length(12)
    if tl:
        f.eval_cis(cilevel=0.9)
    f.add_ar_terms(3)
    f.add_time_trend()
    f.add_seasonal_regressors("month", raw=False, sincos=True)

    models = ("elasticnet", "gbt")
    f.tune_test_forecast(
        models,
        cross_validate=True,
        rolling=True,
        k=2,
        test_length=24,
        space_between_sets=12,
        dynamic_tuning=False,
        suffix="_cv",
        limit_grid_size=2,
        error="raise",
    )
    for m in models:
        assert f"{m}_cv" in f.history

    f.set_estimator("mlr")
    f.add_signals(["elasticnet_cv"], fill_strategy="bfill")
    f.manual_forecast()
    f.save_feature_importance()
    f.add_signals(["elasticnet_cv"], fill_strategy=None)
    f.add_signals(["elasticnet_cv"], train_only=tl > 0)

    f.set_estimator("combo")
    f.manual_forecast()
    if tl:
        f.manual_forecast(
            how="weighted", models="top_2",
            determine_best_by="TestSetRMSE", call_me="weighted",
        )
        assert "weighted" in f.history

    f.set_estimator("naive")
    f.manual_forecast()
    f.manual_forecast(seasonal=True, call_me="snaive")
    assert "snaive" in f.history

    mlp_stack(f, model_nicknames=["gbt_cv", "elasticnet_cv"])
    auto_arima(f, m=12)
    assert "mlp_stack" in f.history and "auto_arima" in f.history

    by = "TestSetSMAPE" if tl else "ValidationMetricValue"
    if tl:
        best = f.order_fcsts(determine_best_by=by)[0]
        assert best in f.history

    f.add_ar_terms([25])

    if tl:
        out = f.export(
            to_excel=True, out_path=str(tmp_path),
            excel_name=f"results_{tl}.xlsx", cis=True,
        )
        assert out
        grid_df = f.export_validation_grid(models[0] + "_cv")
        assert grid_df.count() > 0


def test_order_fcsts_determine_best_by_kwarg(spark):
    """reference calls order_fcsts(determine_best_by=...) — keyword
    name parity with the positional `by`."""
    f = _houst_like(spark, n=120, test_length=12)
    f.set_estimator("naive")
    f.manual_forecast()
    assert f.order_fcsts(determine_best_by="TestSetRMSE") == ["naive"]


# -------------------------------------------- test_transfer_modeling
def test_transfer_modeling(spark):
    """reference test_Forecaster.py:196-228: fit on the short history,
    infer_apply_Xvar_selection onto the extended history, then
    transfer_predict both in-history and as a returned series."""
    f = _houst_like(spark, n=140, test_length=0)
    f_new = _houst_like(spark, n=150, test_length=0)
    f.add_ar_terms(2)
    f.add_time_trend()
    f.set_estimator("mlr")
    f.manual_forecast()
    f_new = infer_apply_Xvar_selection(infer_from=f, apply_to=f_new)
    assert set(f.get_regressor_names()) <= set(f_new.get_regressor_names())
    f_new.transfer_predict(transfer_from=f, model="mlr")
    assert "mlr" in f_new.history
    ser = f_new.transfer_predict(
        transfer_from=f, model="mlr", save_to_history=False,
        return_series=True,
    )
    assert ser is not None


# ------------------------------------------------ test_GridGenerator
def test_gridgenerator_main(tmp_path):
    """reference test_GridGenerator.py verbatim, paths sandboxed."""
    GridGenerator.get_example_grids(
        out_name=str(tmp_path / "ExampleGrids.py"), overwrite=True
    )
    GridGenerator.get_grids(
        "vecm", out_name=str(tmp_path / "VECMGrid.py"), overwrite=True
    )
    GridGenerator.get_mv_grids(overwrite=True)
    GridGenerator.get_empty_grids(
        out_name=str(tmp_path / "Grids.py"), overwrite=True
    )
    for name in ("ExampleGrids.py", "VECMGrid.py", "Grids.py"):
        assert (tmp_path / name).exists()


# --------------------------------------------- test_SeriesTransformer
def test_seriestransformer_main(spark):
    """reference test_SeriesTransformer.py:24-56: every Transform/
    Revert pair round-trips y through a model fit in between (the
    reference fits mlr+elasticnet per transform; one mlr keeps this
    lane fast — revert correctness is the assertion, and the full
    estimator sweep lives in test_reference_workloads)."""
    from scalecast_spark.series_transformer import SeriesTransformer

    f = _houst_like(spark, n=120, test_length=0, future_dates=12)
    # key by DATE: the engine's Diff permanently drops the first m
    # rows from the frame (the reference re-attaches stored originals
    # on revert) — the round-trip invariant is value fidelity on every
    # SURVIVING date
    orig_map = dict(zip(f.current_dates, np.round(f.y.to_numpy(), 2)))
    transformer = SeriesTransformer(f)

    def _check(tname):
        pdf = pd.DataFrame({"ds": f.current_dates, "y": np.round(f.y, 2)})
        assert len(pdf) >= len(orig_map) - 1
        for d, v in zip(pdf["ds"], pdf["y"]):
            assert abs(orig_map[d] - v) < 0.011, (
                f"{tname} revert did not round-trip at {d}: "
                f"{orig_map[d]} vs {v}"
            )

    from dataclasses import replace as _replace

    for t in ("Deseason", "Detrend", "Log", "MinMax", "Scale",
              "RobustScale", "Sqrt", "Diff"):
        f = getattr(transformer, f"{t}Transform")()
        # fit a model between transform and revert on the transforms
        # whose inverses are context-dependent (the reference fits on
        # every one; three keep this lane's history-rewrite coverage
        # at a fraction of the wall-clock)
        if t in ("Detrend", "Scale", "Diff"):
            f.drop_all_Xvars()
            f.add_ar_terms(2)
            f.set_estimator("mlr")
            f.manual_forecast()
        f = getattr(transformer, f"{t}Revert")()
        _check(t)
        # bound plan depth across the 9 chained round-trips: the data
        # is 120 rows, the LINEAGE is the expensive part
        f.pop("mlr")
        f.tsf = _replace(f.tsf, df=f.tsf.df.localCheckpoint(eager=True))

    f = transformer.DetrendTransform(loess=True, frac=0.4, it=0)
    f = transformer.DetrendRevert()
    _check("loess")


# --------------------------------------------------------- test_util
def test_util_missing_vals(spark):
    """reference test_util.py:1-32 verbatim shapes."""
    data = pd.DataFrame({
        "y": [1, 2, np.nan, 4],
        "Date": ["2020-01-01", "2020-02-01", "2020-03-01", "2020-04-01"],
    })
    f = Forecaster_with_missing_vals(
        y=data["y"], current_dates=data["Date"],
        fill_strategy="linear_interp",
    ).round()
    assert f.y.values[2] == 3.0

    data = pd.DataFrame({
        "y": [1, 2, 4],
        "Date": ["2020-01-01", "2020-02-01", "2020-04-01"],
    })
    f = Forecaster_with_missing_vals(
        y=data["y"], current_dates=data["Date"],
        fill_strategy="linear_interp", desired_frequency="MS",
    ).round()
    assert f.y.values[2] == 3.0


def test_util_metrics_statics():
    assert metrics.rmse([1, 2, 3], [1, 2, 3]) == 0.0
    assert metrics.mae([1, 2], [2, 3]) == 1.0
    assert abs(metrics.r2([1, 2, 3], [1, 2, 3]) - 1.0) < 1e-12


# ------------------------------------------- ForecasterGlobals walk
def test_forecaster_globals(spark):
    """reference docs/Forecaster/ForecasterGlobals.ipynb cells 1-12."""
    f = Forecaster(
        y=[1, 2, 3, 4],
        current_dates=["2021-01-01", "2021-02-01", "2021-03-01", "2021-04-01"],
        test_length=0,
        cis=False,
        metrics=["rmse", "mape", "mae", "r2", "smape", "mse", "abias"],
    )
    assert "mlr" in f.estimators and "naive" in f.estimators
    assert f.metrics == ["rmse", "mape", "mae", "r2", "smape", "mse", "abias"]
    assert "TestSetRMSE" in f.determine_best_by
    assert "ValidationMetricValue" in f.determine_best_by
    assert "minmax" in f.normalizer and None in f.normalizer
    mvf = MVForecaster(f, f.copy())
    assert set(mvf.optimizer_funcs) >= {"mean", "min", "max"}


# ----------------------------------------------- test_MVForecaster
class _RobustLike:
    """sklearn-API scaler stand-in (the reference registers sklearn's
    RobustScaler; that package is absent here by design)."""

    def fit(self, X):
        import numpy as np

        self.med = np.median(X, axis=0)
        q75 = np.percentile(X, 75, axis=0)
        q25 = np.percentile(X, 25, axis=0)
        self.iqr = np.where(q75 - q25 == 0, 1.0, q75 - q25)
        return self

    def transform(self, X):
        return (X - self.med) / self.iqr


def _build_mvf(spark, test_length=24, n=180):
    """reference test_MVForecaster.py:10-26 build_MVForecaster —
    three monthly series through the array ctor, explicit names,
    merge_Xvars='i'."""
    rng = np.random.default_rng(5)
    dates = pd.date_range("2005-01-01", periods=n, freq="MS")
    t = np.arange(n)
    base = 4 + 0.01 * t + np.sin(2 * np.pi * t / 12)
    fs = []
    for i, name in enumerate(("UTUR", "UNRATE", "SAHMREALTIME")):
        y = base * (1 + 0.2 * i) + rng.normal(0, 0.3, n)
        fs.append(Forecaster(y=y, current_dates=dates, future_dates=24))
    return MVForecaster(
        *fs, test_length=test_length,
        names=["UTUR", "UNRATE", "SAHMREALTIME"], merge_Xvars="i",
    )


def weighted_series(x):
    return x[0] * 0.75 + x[1] * 0.25


def test_mvf_optimizer_registration(spark):
    """reference test_MVForecaster.py:28-37: a bare callable to
    set_optimize_on registers itself; named registration too."""
    mvf = _build_mvf(spark)
    mvf.set_optimize_on(weighted_series)
    assert mvf._optimize_on == "weighted_series"
    mvf.add_optimizer_func(weighted_series, "weighted")
    mvf.set_optimize_on("weighted")
    assert mvf._optimize_on == "weighted"
    assert "weighted" in mvf.optimizer_funcs


@pytest.mark.parametrize("tl", [0, 24])
def test_mvf_modeling(spark, tmp_path, monkeypatch, tl):
    """reference test_MVForecaster.py:39-107 trimmed: corr_lags,
    lag-order/coint-rank searches through the util object adapters,
    tune_test_forecast with min_grid_size + rolling cv, the VECM
    grids-file flow, set_best_model, whole-object exports, and
    break_mv_forecaster."""
    from scalecast_spark.util import (
        find_optimal_coint_rank, find_optimal_lag_order,
    )
    from scalecast_spark import break_mv_forecaster

    GridGenerator.get_grids(
        "vecm", out_name=str(tmp_path / "VECMGrid.py"), overwrite=True
    )
    monkeypatch.syspath_prepend(str(tmp_path))

    mvf = _build_mvf(spark, test_length=tl)
    mvf.add_Normalizer("robust", _RobustLike)
    mvf.set_metrics(["rmse", "r2"])
    if tl > 0:
        mvf.eval_cis(cilevel=0.9)

    cl = mvf.corr_lags("UNRATE", "UTUR", lags=5)
    assert cl.count() == 5
    lo = find_optimal_lag_order(mvf, maxlags=3)
    assert {"aic", "bic", "scores"} <= set(lo)
    cr = find_optimal_coint_rank(mvf, det_order=-1, k_ar_diff=2)
    assert "rank" in cr

    mvf.set_validation_length(12)
    mvf.tune_test_forecast(
        ("lasso",),
        limit_grid_size=0.2,
        min_grid_size=2,
        cross_validate=True,
        rolling=True,
        k=2,
        error="raise",
        suffix="_cv",
    )
    assert "lasso_cv" in mvf.history
    # min_grid_size floored the .2 fraction of the 3-cell lasso grid
    assert len(mvf.history["lasso_cv"].get("grid_evaluated", [1, 1])) >= 2

    mvf.set_estimator("vecm")
    mvf.set_grids_file("VECMGrid")
    mvf.cross_validate(k=2)
    mvf.auto_forecast()
    assert "vecm" in mvf.history

    mvf.set_best_model(
        determine_best_by=(
            "ValidationMetricValue" if tl == 0 else "TestSetRMSE"
        )
    )

    fvs = mvf.export_fitted_vals()  # no-arg: all models, model column
    assert "model" in fvs.columns and fvs.count() > 0
    out = mvf.export(
        to_excel=True, out_path=str(tmp_path),
        excel_name=f"mv_results_{tl}.xlsx", cis=True,
    )
    assert out

    f1, f2, f3 = break_mv_forecaster(mvf)
    assert f1.tsf.observed.select(SERIES).distinct().count() == 1


# ------------------------------------------------ test_multiseries
def test_multiseries_main(spark):
    """reference test_multiseries.py verbatim shapes (engine-fast
    estimators)."""
    from scalecast_spark.multiseries import (
        export_model_summaries, keep_smallest_first_date,
    )

    rng = np.random.default_rng(9)
    f_dict = {}
    for i, sym in enumerate(("UNRATE", "GDP")):
        n = 120 + 24 * i  # different lengths, like the FRED pulls
        dates = pd.date_range("2010-01-01", periods=n, freq="MS")
        y = 100 + 0.2 * np.arange(n) + rng.normal(0, 3, n)
        f = Forecaster(
            y=y, current_dates=dates, future_dates=12, test_length=0.2,
        )
        f.set_validation_length(12)
        f_dict[sym] = f

    keep_smallest_first_date(*f_dict.values())
    firsts = {
        k: f.tsf.observed.agg(F.min(DS)).collect()[0][0]
        for k, f in f_dict.items()
    }
    assert len(set(firsts.values())) == 1

    for f in f_dict.values():
        f.add_ar_terms(3)
        f.add_time_trend()
        for m in ("elasticnet", "gbt"):
            f.set_estimator(m)
            f.manual_forecast()

    summaries = export_model_summaries(
        f_dict, determine_best_by="TestSetMAE"
    ).toPandas()
    assert set(summaries["Series"]) == {"UNRATE", "GDP"}
    assert set(summaries["ModelNickname"]) == {"elasticnet", "gbt"}


def test_multiseries_line_up_dates(spark):
    from scalecast_spark.multiseries import line_up_dates

    f1 = _houst_like(spark, n=100, test_length=0, future_dates=0)
    f2 = _houst_like(spark, n=80, test_length=0, future_dates=0)
    line_up_dates(f1, f2)
    assert f1.tsf.observed.count() == f2.tsf.observed.count() == 80


# -------------------------------------------------- test_Pipeline
def _light_forecaster(f):
    """The 'Forecast' step (the reference's test_SeriesTransformer
    `forecaster` sweeps 2 estimators + searches; one mlr keeps the
    pipeline-shape lane fast)."""
    f.drop_all_Xvars()
    f.add_ar_terms(2)
    f.set_estimator("mlr")
    f.manual_forecast()


def test_pipeline_reference_flow(spark):
    """reference test_Pipeline.py:18-42: find_optimal_transformation
    pair -> 3-step Pipeline -> fit_predict -> whole-object backtest ->
    backtest_metrics."""
    from scalecast_spark import Pipeline
    from scalecast_spark.util import (
        backtest_metrics, find_optimal_transformation,
    )

    f = _houst_like(spark, n=120, test_length=24, cis=True, future_dates=12)
    transformer, reverter = find_optimal_transformation(
        f,
        num_test_sets=2,
        space_between_sets=24,
        train_length=100,
        test_length=24,
        verbose=True,
        return_train_only=True,
    )
    pipeline = Pipeline(steps=[
        ("Transform", transformer),
        ("Forecast", _light_forecaster),
        ("Revert", reverter),
    ])
    f = pipeline.fit_predict(f)
    assert "mlr" in f.history
    results = pipeline.backtest(f, n_iter=2)
    mets = backtest_metrics(results).toPandas()
    assert "rmse" in mets.columns and len(mets) > 0


def test_mvpipeline_reference_flow(spark):
    """reference test_Pipeline.py:44-79: per-series statistical
    transformation pairs, MVPipeline combine->forecast->break,
    whole-object backtest, backtest_metrics with mase/msis flags."""
    from scalecast_spark import MVPipeline, break_mv_forecaster
    from scalecast_spark.util import (
        backtest_metrics, find_statistical_transformation,
    )

    mvf = _build_mvf(spark, test_length=20, n=120)
    f1, f2, f3 = break_mv_forecaster(mvf)
    pairs = [
        find_statistical_transformation(
            f, goal=["stationary", "seasonally_adj"]
        )
        for f in (f1, f2, f3)
    ]

    def mv_forecaster(mvf):
        mvf.set_estimator("elasticnet")
        mvf.manual_forecast(lags=6, alpha=0.2)
        mvf.set_estimator("ridge")
        mvf.manual_forecast(lags=6, alpha=0.2)

    pipeline = MVPipeline(
        steps=[
            ("Transform", [p[0] for p in pairs]),
            ("Forecast", mv_forecaster),
            ("Revert", [p[1] for p in pairs]),
        ],
        test_length=20,
        cis=True,
    )
    f1, f2, f3 = pipeline.fit_predict(f1, f2, f3)
    # engine naming: the MV twin banks under its registry name
    # (mv_<est>) — the r13-documented mapping set_estimator applies
    assert "mv_elasticnet" in f1.history and "mv_ridge" in f3.history

    results = pipeline.backtest(f1, f2, f3, n_iter=2, jump_back=6)
    train_df = f1.tsf.observed.unionByName(
        f2.tsf.observed.unionByName(f3.tsf.observed)
    ).select(SERIES, DS, Y)
    mets = backtest_metrics(
        results,
        train_df=train_df,
        mets=["rmse", "smape", "mape", "r2", "mae"],
        names=["UTUR", "UNRATE", "SAHMREALTIME"],
        mase=True,
        msis=True,
        m=12,
    ).toPandas()
    assert {"rmse", "mase"} <= set(mets.columns)
    # msis needs interval columns on the backtest frame; the engine's
    # backtest emits point forecasts, so the flag degrades gracefully
    assert len(mets) > 0


# ------------------------------------------------ README examples
def test_readme_lstm_and_axs_shapes(spark):
    """reference README.md 'Popular Features' #1/#2: the Keras-flavored
    LSTM kwargs (learning_rate / lstm_layer_sizes stacks) remap onto
    the numpy core's lr / summed hidden width; auto_Xvar_select
    accepts the cross_validate/cvkwargs call shape."""
    f = _houst_like(spark, n=100, test_length=12, future_dates=12)
    sel = f.auto_Xvar_select(
        estimator="lasso", alpha=0.2,
        monitor="ValidationMetricValue",
        cross_validate=True, cvkwargs={"k": 3},
    )
    assert isinstance(sel, list)
    f.add_ar_terms(3)
    f.set_estimator("lstm")
    f.manual_forecast(
        lags=12, batch_size=32, epochs=3, validation_split=0.2,
        activation="tanh", optimizer="Adam", learning_rate=0.001,
        lstm_layer_sizes=(16,) * 2, dropout=(0,) * 2,
    )
    assert f.history["lstm"]["forecast"].count() == 12


# ------------------------------- Introduction2 notebook (round 15)
def test_introduction2_auto_pipeline_tour(spark, tmp_path, monkeypatch):
    """reference docs/examples/Introduction2.ipynb cells 80-91 (the
    auto-pipeline tour, scaled monthly m=12 for runtime): example
    grids file -> find_optimal_transformation with the notebook's full
    kwarg shape (lags/m/monitor/estimator/alpha/test_length/
    num_test_sets/space_between_sets/verbose) ->
    auto_Xvar_select(monitor='TestSetMAE', irr_cycles=[26]) +
    tune_test_forecast(cross_validate=True, dynamic_tuning=,
    dynamic_testing=) inside a Pipeline driven by
    fit_predict(f, models=[...]) -> whole-object
    backtest(cis=False, models=[...]) ->
    backtest_metrics(mets=['smape','rmse','bias'])."""
    from scalecast_spark import GridGenerator, Pipeline
    from scalecast_spark.util import (
        backtest_metrics, find_optimal_transformation,
    )

    out = tmp_path / "Grids.py"
    GridGenerator.get_example_grids(out_name=str(out), overwrite=True)
    monkeypatch.syspath_prepend(str(tmp_path))

    f = _houst_like(spark, n=120, future_dates=12, test_length=18)
    transformer, reverter = find_optimal_transformation(
        f, lags=12, m=12, monitor="mae", estimator="elasticnet",
        alpha=0.2, test_length=12, num_test_sets=3,
        space_between_sets=4, verbose=True,
    )

    def forecaster_aut(f, models):
        f.auto_Xvar_select(
            estimator="elasticnet", monitor="TestSetMAE", alpha=0.2,
            irr_cycles=[26],
        )
        f.set_grids_file("Grids")
        f.tune_test_forecast(
            models, cross_validate=True, k=2, dynamic_tuning=6,
            dynamic_testing=6, limit_grid_size=2, error="raise",
        )

    pipeline_aut = Pipeline(steps=[
        ("Transform", transformer),
        ("Forecast", forecaster_aut),
        ("Revert", reverter),
    ])
    f = pipeline_aut.fit_predict(f, models=["mlr", "elasticnet"])
    assert "mlr" in f.history and "elasticnet" in f.history

    uv = pipeline_aut.backtest(
        f, n_iter=2, jump_back=6, cis=False, models=["mlr", "elasticnet"],
    )
    mets = backtest_metrics(uv, mets=["smape", "rmse", "bias"]).toPandas()
    for met in ("smape", "rmse", "bias"):
        assert met in mets.columns


def test_introduction2_combo_after_tune(spark, tmp_path, monkeypatch):
    """Introduction2 cell 104 (forecaster_scaled): tune_test_forecast
    then set_estimator('combo'); manual_forecast() — the bare combo
    over tuned members exercises the ValidationMetricValue-weighted
    default path end-to-end."""
    from scalecast_spark import GridGenerator

    out = tmp_path / "Grids.py"
    GridGenerator.get_example_grids(out_name=str(out), overwrite=True)
    monkeypatch.syspath_prepend(str(tmp_path))
    f = _houst_like(spark, n=100, future_dates=6, test_length=12)
    f.set_validation_length(12)
    f.add_ar_terms(3)
    f.add_time_trend()
    f.set_grids_file("Grids")
    f.tune_test_forecast(
        ["mlr", "elasticnet"], limit_grid_size=2, error="raise",
    )
    f.set_estimator("combo")
    f.manual_forecast()
    assert "combo" in f.history
    # and the weighted default resolves ValidationMetricValue without
    # the fallback warning when the members are the tuned pair
    # (models='all' would sweep in the untuned simple combo above and
    # correctly trigger the TestSetRMSE fallback warning instead)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        f.manual_forecast(
            how="weighted", models=["mlr", "elasticnet"], call_me="combo_w",
        )
    assert "combo_w" in f.history


def test_introduction2_mv_tour(spark, tmp_path, monkeypatch):
    """Introduction2 cells 92-102: mv grids file, MVPipeline with
    names= and an 'Add Xvars' callable-list step, rolling CV in the
    forecast step, fit_predict(models=), whole-object backtest with
    test_length=0/cis=False/models=, backtest_metrics(names=)."""
    from scalecast_spark import GridGenerator, MVPipeline
    from scalecast_spark.util import (
        backtest_metrics, find_optimal_transformation,
    )

    out = tmp_path / "Grids.py"
    GridGenerator.get_mv_grids(out_name=str(out), overwrite=True)
    monkeypatch.syspath_prepend(str(tmp_path))

    fvol = _houst_like(spark, n=100, seed=5, future_dates=6, test_length=15)
    fprice = _houst_like(spark, n=100, seed=9, future_dates=6, test_length=15)

    tvol, rvol = find_optimal_transformation(
        fvol, lags=6, m=12, monitor="mae", estimator="elasticnet",
        alpha=0.2, test_length=6, num_test_sets=2, space_between_sets=4,
    )
    tprice, rprice = find_optimal_transformation(
        fprice, lags=6, m=12, monitor="mae", estimator="elasticnet",
        alpha=0.2, test_length=6, num_test_sets=2, space_between_sets=4,
    )

    def add_vars(f, **kwargs):
        f.add_seasonal_regressors("month", raw=False, sincos=True)

    def mvforecaster(mvf, models):
        mvf.set_optimize_on("volume")
        mvf.set_grids_file("Grids")
        mvf.tune_test_forecast(
            models, cross_validate=True, k=2, rolling=True,
            dynamic_tuning=6, dynamic_testing=6, limit_grid_size=2,
            error="raise",
        )

    mvpipeline = MVPipeline(
        steps=[
            ("Transform", [tvol, tprice]),
            ("Add Xvars", [add_vars] * 2),
            ("Forecast", mvforecaster),
            ("Revert", [rvol, rprice]),
        ],
        test_length=20,
        cis=True,
        names=["volume", "price"],
    )
    fvol, fprice = mvpipeline.fit_predict(fvol, fprice, models=["mlr"])
    # tune_test_forecast banks under the loop name (reference
    # _utils.py:110 call_me = m + suffix), unlike bare set_estimator+
    # manual_forecast which banks the registry twin name mv_<est>
    assert "mlr" in fvol.history and "mlr" in fprice.history

    bt = mvpipeline.backtest(
        fvol, fprice, n_iter=2, jump_back=6, test_length=0, cis=False,
        models=["mlr"],
    )
    mets = backtest_metrics(
        bt, mets=["smape", "rmse", "bias"], names=["Volume", "Price"],
    ).toPandas()
    for met in ("smape", "rmse", "bias"):
        assert met in mets.columns
