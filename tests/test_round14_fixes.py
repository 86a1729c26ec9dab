"""Round-14 verdict/advice items: GridGenerator.get_grids/
get_empty_grids file round-trip (reference GridGenerator.py:3-83),
DetrendTransform ln_trend/seasonal_lags/fit_intercept (reference
SeriesTransformer.py:121-311), export() models-string normalization
and single-frame returns, the multi-series-input retag guard on the
whole-object pipeline paths, the backtest no-model diagnostic, the
revert_instance summary-dict isolation, and MVForecaster positional
alias resolution (optimize_on='y1')."""

import sys
import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster, GridGenerator, MVForecaster
from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y
from scalecast_spark.models import MODELS
from scalecast_spark.pipeline import MVPipeline, Pipeline


def _daily(spark, n=60, sids=("a",), seed=3, trend=0.3):
    rng = np.random.default_rng(seed)
    frames = []
    for s in sids:
        ds = pd.date_range("2024-01-01", periods=n, freq="D")
        y = 50 + trend * np.arange(n) + rng.normal(0, 2, n)
        frames.append(pd.DataFrame({SERIES: s, DS: ds, Y: y}))
    return spark.createDataFrame(pd.concat(frames))


# ------------------------------------------------- GridGenerator
def test_get_grids_roundtrip(spark, tmp_path, monkeypatch):
    """get_grids('theta') then ingest_grid('theta') — the reference's
    documented first-call workflow (GridGenerator.py:3-31)."""
    out = tmp_path / "Grids.py"
    GridGenerator.get_grids("theta", out_name=str(out))
    assert out.exists()
    monkeypatch.syspath_prepend(str(tmp_path))
    f = Forecaster(_daily(spark), future_dates=5)
    f.set_grids_file("Grids")
    f.ingest_grid("theta")
    assert f.grid and all("m" in cell for cell in f.grid)


def test_get_grids_overwrite_contract(tmp_path):
    out = tmp_path / "Grids.py"
    out.write_text("sentinel = 1\n")
    GridGenerator.get_grids("example", out_name=str(out))  # no overwrite
    assert out.read_text() == "sentinel = 1\n"
    GridGenerator.get_grids("example", out_name=str(out), overwrite=True)
    assert "mlr" in out.read_text()


def test_get_empty_grids(tmp_path):
    out = tmp_path / "Grids.py"
    GridGenerator.get_empty_grids(out_name=str(out))
    ns: dict = {}
    exec(out.read_text(), ns)
    assert ns["mlr"] == {} and ns["naive"] == {}
    # every registered estimator gets a scaffold entry
    assert set(MODELS) <= {k for k in ns if not k.startswith("_")}


def test_get_example_grids_writes_when_asked(tmp_path):
    got = GridGenerator.get_example_grids(out_name=str(tmp_path / "G.py"))
    assert isinstance(got, dict) and "mlr" in got
    ns: dict = {}
    exec((tmp_path / "G.py").read_text(), ns)
    assert ns["mlr"] == got["mlr"]


def test_unknown_grid_set_raises():
    with pytest.raises(ValueError, match="no grids set"):
        GridGenerator.get_grids("nope", out_name="/tmp/_never.py",
                                overwrite=True)


# ---------------------------------------------- Detrend design fit
def _one_series(spark, n=60):
    ds = pd.date_range("2024-01-01", periods=n, freq="D")
    y = 5.0 + 3.0 * np.log(np.arange(1, n + 1)) + np.sin(np.arange(n)) * 0.5
    pdf = pd.DataFrame({SERIES: "s1", DS: ds, Y: y, IS_FUTURE: 0})
    return spark.createDataFrame(pdf), y


def test_detrend_ln_trend_matches_numpy(spark):
    from scalecast_spark.operators.transforms import DetrendTransform

    df, y = _one_series(spark)
    n = len(y)
    t = DetrendTransform()
    t.ln_trend = True
    t.fit(df)
    got = (
        t.transform(df).orderBy(DS).toPandas()[Y].to_numpy()
    )
    X = np.column_stack([np.ones(n), np.log(np.arange(1, n + 1))])
    res = y - X @ np.linalg.lstsq(X, y, rcond=None)[0]
    assert np.abs(got - res).max() < 1e-9
    back = t.invert(t.transform(df), Y).orderBy(DS).toPandas()[Y].to_numpy()
    assert np.abs(back - y).max() < 1e-9


def test_detrend_seasonal_lags_drops_prefix_and_matches(spark):
    from scalecast_spark.operators.transforms import DetrendTransform

    df, y = _one_series(spark)
    n = len(y)
    t = DetrendTransform()
    t.ln_trend = True
    t.seasonal_lags = 2
    t.m = 7
    t.fit(df)
    obs = t.transform(df).orderBy(DS).toPandas()
    # the first seasonal_lags*m rows leave the series, like the
    # reference's dropna + keep_smaller_history
    assert len(obs) == n - 14
    tt = np.arange(1.0, n + 1)
    mask = tt > 14
    X = np.column_stack(
        [np.ones(int(mask.sum())), np.log(tt[mask]),
         np.log(tt[mask] - 7), np.log(tt[mask] - 14)]
    )
    res = y[mask] - X @ np.linalg.lstsq(X, y[mask], rcond=None)[0]
    assert np.abs(obs[Y].to_numpy() - res).max() < 1e-8


def test_detrend_no_intercept(spark):
    from scalecast_spark.operators.transforms import DetrendTransform

    df, y = _one_series(spark)
    n = len(y)
    t = DetrendTransform()
    t.fit_intercept = False
    t.fit(df)
    got = t.transform(df).orderBy(DS).toPandas()[Y].to_numpy()
    X = np.arange(1.0, n + 1).reshape(-1, 1)
    res = y - (X @ np.linalg.lstsq(X, y, rcond=None)[0]).ravel()
    assert np.abs(got - res).max() < 1e-9


def test_series_transformer_detrend_kwargs(spark):
    """ln_trend forwards; unknown kwargs WARN instead of silently
    vanishing (r13 verdict #3)."""
    from scalecast_spark.series_transformer import SeriesTransformer

    f = Forecaster(_daily(spark), future_dates=5)
    st = SeriesTransformer(f)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        st.DetrendTransform(ln_trend=True)  # no warning
    st2 = SeriesTransformer(Forecaster(_daily(spark), future_dates=5))
    with pytest.warns(UserWarning, match="unsupported kwargs"):
        st2.DetrendTransform(bogus_knob=1)


# --------------------------------------------------- export fixes
def _fitted(spark, names=("mlr", "mlr2")):
    f = Forecaster(_daily(spark), future_dates=5)
    f.set_test_length(5)
    for n in names:
        f.set_estimator("naive")
        f.manual_forecast(call_me=n)
    return f


def test_export_models_string_exact_match(spark):
    f = _fitted(spark)
    out = f.export("model_summaries", models="mlr").toPandas()
    # 'mlr' must NOT substring-match 'mlr2'
    assert list(out["ModelNickname"]) == ["mlr"]


def test_export_models_top_n(spark):
    f = _fitted(spark)
    out = f.export("model_summaries", models="top_1").toPandas()
    assert len(out) == 1
    assert out["ModelNickname"].iloc[0] == f.order_fcsts("TestSetRMSE")[0]


# -------------------------------------- pipeline retag/diag guards
def test_mvpipeline_rejects_multiseries_inputs(spark):
    f1 = Forecaster(_daily(spark, sids=("a", "b")), future_dates=5)
    f2 = Forecaster(_daily(spark, sids=("c",)), future_dates=5)
    pipe = MVPipeline([
        ("model", lambda mvf, models=("naive",): [
            (mvf.set_estimator(m), mvf.manual_forecast())[0] for m in models
        ]),
    ])
    with pytest.raises(ValueError, match="multiple series"):
        pipe.fit_predict(f1, f2)


def test_backtest_without_model_step_raises(spark):
    f = Forecaster(_daily(spark), future_dates=5)
    # forecaster-shaped step (first param f) that banks no forecasts
    pipe = Pipeline([("noop", lambda f: f)])
    with pytest.raises(ValueError, match="banked"):
        pipe.backtest(f, fcst_length=5, n_iter=1)


# ------------------------------------- revert summary isolation
def test_revert_does_not_mutate_shared_summary(spark):
    from scalecast_spark.series_transformer import SeriesTransformer

    f = Forecaster(_daily(spark), future_dates=5)
    f.set_test_length(5)
    st = SeriesTransformer(f)
    st.DiffTransform(1)
    f.set_estimator("naive")
    f.manual_forecast()
    shared = f.history["naive"]["summary"]
    snapshot = dict(shared)
    st.DiffRevert(1)
    # the revert wrote new TestSet*/InSample* metrics into ITS OWN
    # summary copy; the previously shared dict is untouched
    assert shared == snapshot
    assert f.history["naive"]["summary"] is not shared


# ------------------------------------------- MV alias resolution
def test_optimize_on_positional_alias(spark):
    f1 = Forecaster(_daily(spark, sids=("clicks",), seed=1))
    f2 = Forecaster(_daily(spark, sids=("sales",), seed=2))
    mv = MVForecaster(f1, f2)
    mv.set_optimize_on("y2")
    assert mv._optimize_on == "sales"
    mv.set_optimize_on("series1")
    assert mv._optimize_on == "clicks"
    # real ids and aggregate modes pass through untouched
    mv.set_optimize_on("clicks")
    assert mv._optimize_on == "clicks"
    mv.set_optimize_on("mean")
    assert mv._optimize_on == "mean"


def test_mvforecaster_ctor_kwargs_apply(spark):
    f1 = Forecaster(_daily(spark, sids=("a",), seed=1))
    f2 = Forecaster(_daily(spark, sids=("b",), seed=2))
    # cis=True routes through eval_cis (round-15 ADVICE) — the
    # soundness bound needs test_length >= 1/(1-cilevel) = 20
    mv = MVForecaster(
        f1, f2, optimize_on="y1", cis=True, metrics=["rmse", "mae"],
        test_length=20,
    )
    assert mv._optimize_on == "a"
    assert mv.cis is True
    assert mv.metrics == ["rmse", "mae"]


# ------------------------------------- kernel-CV width decision
def test_kernel_cv_split_width_decision(spark):
    """r14 verdict #7: the (series x fold x cell-chunk) task split
    must widen ONLY in the few-series regime — at >= defaultParallelism
    series the replication factor is exactly 1 (no shuffle bytes spent
    where compute wouldn't idle). Asserts the recorded decision from
    models.kernel.LAST_CV_SPLIT through the real cross_validate path."""
    import sys

    sys.path.insert(0, "tools")
    import cv_width_probe as P

    from scalecast_spark import Forecaster
    from scalecast_spark.models import kernel

    cores = spark.sparkContext.defaultParallelism

    few = Forecaster(P.synth(spark, 3, 120))
    few.set_validation_length(5)
    few.set_estimator("ridge")
    few.ingest_grid({"alpha": [0.1, 1.0]})
    few.add_ar_terms(2)
    few.cross_validate(k=3)
    assert kernel.LAST_CV_SPLIT["replication"] > 1
    assert kernel.LAST_CV_SPLIT["fold_split"] is True

    many = Forecaster(P.synth(spark, cores + 8, 60))
    many.set_validation_length(5)
    many.set_estimator("ridge")
    many.ingest_grid({"alpha": [0.1, 1.0]})
    many.add_ar_terms(2)
    many.cross_validate(k=3)
    assert kernel.LAST_CV_SPLIT["replication"] == 1
    assert kernel.LAST_CV_SPLIT["chunk_count"] == 1
