"""Round-13 verdict/advice items: Pipeline.backtest observed-history
guard (pre-existing is_future rows must not be counted as the newest
observations), MVForecaster default naming on series_id overlap
(reference MVForecaster.py:150-152), export(dfs=list) dict return
(reference Forecaster.py:2065-2080), keep_smaller_history date
validation, and the kernel-CV (series × fold × cell-chunk) task split
scoring bit-identically to the series-only grouping."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster, MVForecaster
from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y
from scalecast_spark.models import MODELS
from scalecast_spark.pipeline import Pipeline, backtest


def _daily(spark, n=60, sids=("a",), seed=3):
    rng = np.random.default_rng(seed)
    frames = []
    for s in sids:
        ds = pd.date_range("2024-01-01", periods=n, freq="D")
        y = 50 + 0.3 * np.arange(n) + rng.normal(0, 2, n)
        frames.append(pd.DataFrame({SERIES: s, DS: ds, Y: y}))
    return spark.createDataFrame(pd.concat(frames))


def test_pipeline_backtest_ignores_future_rows(spark):
    """A Forecaster frame carries future_dates=N synthetic y-NULL
    horizon rows; the backtest rewind must count only OBSERVED rows,
    so every held-out row joins a real actual (y never NULL)."""
    f = Forecaster(_daily(spark), future_dates=10)
    pipe = Pipeline([("model", lambda df: MODELS["naive"](df))])
    out = pipe.backtest(f, fcst_length=5, n_iter=2)
    rows = out.collect()
    assert len(rows) == 10  # 2 iterations x 5 held-out rows
    assert all(r[Y] is not None for r in rows), "horizon leaked into holdout"
    assert all(r["forecast"] is not None for r in rows)
    # iteration 0's newest held-out ds is the LAST OBSERVED day, not a
    # synthetic future day
    max_ds = max(r[DS] for r in rows)
    last_obs = (
        f.tsf.df.filter(F.col(IS_FUTURE) == 0)
        .agg(F.max(DS)).collect()[0][0]
    )
    assert max_ds == last_obs


def test_module_backtest_ignores_future_rows(spark):
    df = Forecaster(_daily(spark), future_dates=7).tsf.df
    out = backtest(
        df, {"naive": lambda d: MODELS["naive"](d)}, fcst_length=4, n_iter=1
    )
    rows = out.collect()
    assert len(rows) == 4
    assert all(r[Y] is not None for r in rows)


def test_mvforecaster_auto_names_on_overlap(spark):
    """Two single-series Forecasters sharing a series_id get the
    reference's positional default names y1..yk instead of silently
    merging into one series with duplicate timestamps."""
    f1 = Forecaster(_daily(spark, sids=("sales",), seed=1))
    f2 = Forecaster(_daily(spark, sids=("sales",), seed=2))
    mv = MVForecaster(f1, f2)
    ids = sorted(
        r[0] for r in mv.tsf.df.select(SERIES).distinct().collect()
    )
    assert ids == ["y1", "y2"]
    # no duplicate (series, ds) keys survived
    dup = (
        mv.tsf.df.groupBy(SERIES, DS).count().filter(F.col("count") > 1)
    ).count()
    assert dup == 0


def test_mvforecaster_overlap_multiseries_raises(spark):
    f1 = Forecaster(_daily(spark, sids=("a", "b"), seed=1))
    f2 = Forecaster(_daily(spark, sids=("b",), seed=2))
    with pytest.raises(ValueError, match="overlap"):
        MVForecaster(f1, f2)


def test_mvforecaster_disjoint_keeps_ids(spark):
    f1 = Forecaster(_daily(spark, sids=("a",), seed=1))
    f2 = Forecaster(_daily(spark, sids=("b",), seed=2))
    mv = MVForecaster(f1, f2)
    ids = sorted(
        r[0] for r in mv.tsf.df.select(SERIES).distinct().collect()
    )
    assert ids == ["a", "b"]


def test_export_list_returns_dict(spark):
    f = Forecaster(_daily(spark), future_dates=5)
    f.set_test_length(5)
    f.set_estimator("naive")
    f.manual_forecast()
    out = f.export(["model_summaries", "lvl_fcsts"])
    assert isinstance(out, dict)
    assert set(out) == {"model_summaries", "lvl_fcsts"}
    assert out["model_summaries"].count() == 1
    # dfs= keyword routes the same way (reference's common call shape);
    # a ONE-element list returns the lone frame, like the reference
    # (round-14 ADVICE)
    out2 = f.export(dfs=["model_summaries"])
    assert not isinstance(out2, dict) and out2.count() == 1


def test_keep_smaller_history_rejects_bad_date(spark):
    f = Forecaster(_daily(spark))
    with pytest.raises(ValueError, match="parseable|NaT"):
        f.keep_smaller_history("2024-13-01")
    # a valid cutoff still filters
    before = f.tsf.df.count()
    f.keep_smaller_history("2024-02-01")
    after = f.tsf.df.count()
    assert 0 < after < before


def test_kernel_cv_split_matches_series_only(spark):
    """run_kernel_cv with the (series x fold x cell-chunk) split active
    (n_series small) emits the same (fold, cell, series, ds-less
    holdout) scores as the series-only grouping (n_series=None)."""
    from scalecast_spark.models import KERNEL_FACTORIES
    from scalecast_spark.models.kernel import run_kernel_cv

    df = Forecaster(_daily(spark, sids=("a", "b"))).add_ar_terms(2).tsf.df
    feats = ["ar_1", "ar_2"]
    cells = [
        (KERNEL_FACTORIES["mlr"](), None, False),
        (KERNEL_FACTORIES["ridge"](alpha=0.5), "scale", False),
        (KERNEL_FACTORIES["knn"](n_neighbors=4), "minmax", False),
    ]
    kw = dict(k=3, test_length=5, space=5, aside=0, train_length=None)
    plain = run_kernel_cv(df, feats, cells, n_series=None, **kw)
    split = run_kernel_cv(df, feats, cells, n_series=2, **kw)
    a = {
        (r["_fold"], r["_cell"], r[SERIES], round(r[Y], 9)): round(
            r["forecast"], 9
        )
        for r in plain.collect()
    }
    b = {
        (r["_fold"], r["_cell"], r[SERIES], round(r[Y], 9)): round(
            r["forecast"], 9
        )
        for r in split.collect()
    }
    assert a == b and len(a) == 3 * 3 * 2 * 5  # folds x cells x series x holdout


def test_cross_validate_small_series_still_picks_best(spark):
    f = Forecaster(_daily(spark, sids=("a", "b", "c")))
    f.add_ar_terms(2)
    f.set_test_length(5)
    f.set_estimator("ridge")
    f.ingest_grid({"alpha": [0.01, 100.0]})
    f.cross_validate(k=2, test_length=5)
    assert f.best_params["alpha"] in (0.01, 100.0)
    assert not math.isnan(f.validation_metric_value)


def test_mvpipeline_scalar_steps_series_count_independent(spark):
    """Scale-boundary contract (r12 verdict #8): SCALAR pipeline steps
    run one distributed plan over the long frame — the plan shape
    (exchange/union/window node counts) must not change with the
    number of series; only LIST-valued steps loop the driver."""
    from scalecast_spark.operators import transforms as tr
    from scalecast_spark.pipeline import MVPipeline, Reverter, Transformer

    def plan_shape(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return {
            node: p.count(node)
            for node in ("Exchange", "Union", "Window", "Filter")
        }

    def build(n_series):
        frames = []
        for s in range(n_series):
            frames.append(
                pd.DataFrame({
                    SERIES: f"s{s}",
                    DS: pd.date_range("2024-01-01", periods=40, freq="D"),
                    Y: np.arange(40, dtype=float) + s,
                })
            )
        return spark.createDataFrame(pd.concat(frames)).withColumn(
            IS_FUTURE, F.lit(0)
        )

    t = Transformer([tr.ScaleTransform()])
    pipe = MVPipeline(steps=[
        ("T", t),
        ("M", lambda df: MODELS["naive"](df, m=7)),
        ("R", Reverter(t)),
    ])
    out2 = pipe.fit_predict(build(2))
    t2 = Transformer([tr.ScaleTransform()])
    pipe5 = MVPipeline(steps=[
        ("T", t2),
        ("M", lambda df: MODELS["naive"](df, m=7)),
        ("R", Reverter(t2)),
    ])
    out5 = pipe5.fit_predict(build(5))
    assert plan_shape(out2) == plan_shape(out5)
    assert out5.count() == 5 * 40


def test_forecaster_globals_introspection(spark):
    """reference docs/Forecaster/ForecasterGlobals.ipynb: f.estimators,
    f.metrics, f.determine_best_by, f.normalizer, mvf.optimizer_funcs."""
    f = Forecaster(_daily(spark))
    assert {"mlr", "ridge", "knn", "naive", "arima"} <= set(f.estimators)
    assert "rmse" in f.metrics
    assert "TestSetRMSE" in f.determine_best_by
    assert "ValidationMetricValue" in f.determine_best_by
    assert {"minmax", "scale", "robust", None} <= set(f.normalizer)
    mv = MVForecaster(
        Forecaster(_daily(spark, sids=("a",))),
        Forecaster(_daily(spark, sids=("b",))),
    )
    assert {"mean", "min", "max"} <= set(mv.optimizer_funcs)


def test_low_level_estimator_api(spark):
    """reference Models.rst: f.init_estimator(...) -> f.fit() ->
    f.predict() / f.predict_fitted_vals(); and the method form of
    tune_test_forecast (README's primary example)."""
    f = Forecaster(_daily(spark), future_dates=6)
    f.add_ar_terms(2)
    f.init_estimator("ridge", alpha=0.5)
    with pytest.raises(ValueError, match="fit"):
        f.predict()
    f.fit()
    preds = f.predict()
    assert isinstance(preds, list) and len(preds) == 6
    assert all(isinstance(v, float) for v in preds)
    fv = f.predict_fitted_vals()
    assert len(fv) == 60 - 2  # AR warm-up rows have no fitted value
    # multi-series returns per-series lists
    g = Forecaster(_daily(spark, sids=("a", "b")), future_dates=3)
    g.add_ar_terms(1)
    g.init_estimator("mlr").fit()
    out = g.predict()
    assert set(out) == {"a", "b"} and all(len(v) == 3 for v in out.values())

    # method-form tune_test_forecast
    h = Forecaster(_daily(spark), future_dates=5)
    h.set_test_length(10).set_validation_length(5)
    h.add_ar_terms(2)
    h.tune_test_forecast(["mlr", "ridge"], grids={
        "mlr": {"normalizer": [None]}, "ridge": {"alpha": [0.1, 1.0]},
    }, error="raise")
    assert sorted(h.history) == ["mlr", "ridge"]


@pytest.mark.parametrize("stack", [
    ["LogTransform"],
    ["SqrtTransform"],
    ["ScaleTransform"],
    ["MinMaxTransform"],
    ["RobustScaleTransform"],
    ["DeseasonTransform"],
    ["DiffTransform"],
    ["DetrendTransform"],
    ["LogTransform", "DiffTransform", "ScaleTransform"],
    ["DeseasonTransform", "DetrendTransform"],
])
def test_seriestransformer_roundtrip_all_transforms(spark, stack):
    """Every SeriesTransformer transform (and two stacks) round-trips
    y exactly after reverts in reverse order, and reverts a banked
    model's history to finite level-scale values."""
    from scalecast_spark.series_transformer import SeriesTransformer

    f = Forecaster(_daily(spark, n=50), future_dates=4)
    f.set_test_length(6)
    t = SeriesTransformer(f)
    for name in stack:
        f = getattr(t, name)() if name != "DeseasonTransform" else t.DeseasonTransform(m=7)
    f.set_estimator("naive")
    f.manual_forecast(m=7)
    for name in reversed(stack):
        f = getattr(t, name.replace("Transform", "Revert"))()
    got = (
        f.tsf.df.filter("is_future=0").orderBy(DS).select(Y).toPandas()[Y]
    ).to_numpy()
    raw = (
        _daily(spark, n=50).orderBy(DS).select(Y).toPandas()[Y]
    ).to_numpy()
    # Diff drops its warm-up prefix; compare the surviving suffix
    assert np.abs(got - raw[len(raw) - len(got):]).max() < 1e-7, stack
    fc = f.history["naive"]["forecast"].collect()
    assert len(fc) == 4 and all(
        r["forecast"] is not None and math.isfinite(r["forecast"]) for r in fc
    ), stack
    rmse = f.history["naive"]["summary"]["TestSetRMSE"]
    assert math.isfinite(rmse), stack


def test_seriestransformer_exclude_models(spark):
    from scalecast_spark.series_transformer import SeriesTransformer

    f = Forecaster(_daily(spark, n=50), future_dates=4)
    f.set_test_length(6)
    t = SeriesTransformer(f)
    f = t.ScaleTransform()
    f.set_estimator("naive")
    f.manual_forecast(m=7, call_me="keep_scaled")
    f.manual_forecast(m=7, call_me="revert_me")
    scaled_fc = f.history["keep_scaled"]["forecast"].collect()
    f = t.ScaleRevert(exclude_models=("keep_scaled",))
    after = f.history["keep_scaled"]["forecast"].collect()
    assert [r["forecast"] for r in after] == [r["forecast"] for r in scaled_fc]
    reverted = [r["forecast"] for r in f.history["revert_me"]["forecast"].collect()]
    assert reverted != [r["forecast"] for r in scaled_fc]


def test_mvpipeline_backtest_without_names(spark):
    """Review finding: backtest over multiple Forecasters WITHOUT
    names= must retag actuals consistently with the default y1..yk —
    not return a silently empty frame."""
    from scalecast_spark.pipeline import MVPipeline

    def mvforecaster(mvf):
        mvf.set_estimator("mv_mlr")
        mvf.manual_forecast(lags=2)

    p = MVPipeline(steps=[("F", mvforecaster)])
    f1 = Forecaster(_daily(spark, sids=("a",), seed=1), future_dates=4)
    f2 = Forecaster(_daily(spark, sids=("b",), seed=2), future_dates=4)
    bt = p.backtest(f1, f2, n_iter=2)
    rows = bt.collect()
    assert len(rows) == 2 * 2 * 4  # series x iters x horizon
    assert all(r[Y] is not None for r in rows)
    assert {r[SERIES] for r in rows} == {"y1", "y2"}


def test_plain_pipeline_backtest_multi_forecaster_raises(spark):
    def forecaster(f):
        f.set_estimator("naive")
        f.manual_forecast()

    p = Pipeline(steps=[("F", forecaster)])
    f1 = Forecaster(_daily(spark, sids=("a",)), future_dates=3)
    f2 = Forecaster(_daily(spark, sids=("b",)), future_dates=3)
    with pytest.raises(TypeError, match="MVPipeline"):
        p.backtest(f1, f2, n_iter=1)


def test_reverter_positional_list_and_partial_revert(spark):
    """Review findings: Reverter(reverters_list, base_transformer=t)
    must bind correctly, and a PARTIAL reverters list must revert only
    the named transforms."""
    from scalecast_spark.operators import transforms as tr
    from scalecast_spark.pipeline import Reverter, Transformer

    df = _daily(spark).withColumn(IS_FUTURE, F.lit(0))
    t = Transformer([tr.DetrendTransform(), tr.DiffTransform(1)])
    transformed = t.fit_transform(df)
    # positional reverters list (reference signature order)
    r_full = Reverter(
        [("DiffRevert", 1), ("DetrendRevert",)], base_transformer=t
    )
    assert r_full.base is t
    back = r_full.fit_transform(transformed, Y)
    err = (
        back.select(SERIES, DS, F.col(Y).alias("y1"))
        .join(df.select(SERIES, DS, F.col(Y).alias("y0")), [SERIES, DS])
        .agg(F.max(F.abs(F.col("y0") - F.col("y1")))).collect()[0][0]
    )
    assert err < 1e-8
    # partial list: only the diff reverts; detrend stays applied
    r_part = Reverter(reverters=[("DiffRevert", 1)], base_transformer=t)
    part = r_part.fit_transform(transformed, Y)
    err2 = (
        part.select(SERIES, DS, F.col(Y).alias("y1"))
        .join(df.select(SERIES, DS, F.col(Y).alias("y0")), [SERIES, DS])
        .agg(F.max(F.abs(F.col("y0") - F.col("y1")))).collect()[0][0]
    )
    assert err2 > 1.0  # still detrended — NOT fully reverted


def test_seriestransformer_train_only_scaler(spark):
    """Review finding: train_only=True must exclude the test window
    from the scaler fit (different params than a full fit)."""
    from scalecast_spark.series_transformer import SeriesTransformer

    # strong trend: the last-6 window shifts the mean materially
    f1 = Forecaster(_daily(spark, n=50))
    f1.set_test_length(6)
    t1 = SeriesTransformer(f1)
    f1 = t1.ScaleTransform(train_only=True)
    f2 = Forecaster(_daily(spark, n=50))
    f2.set_test_length(6)
    t2 = SeriesTransformer(f2)
    f2 = t2.ScaleTransform(train_only=False)
    a = f1.tsf.df.orderBy(DS).select(Y).toPandas()[Y].to_numpy()
    b = f2.tsf.df.orderBy(DS).select(Y).toPandas()[Y].to_numpy()
    assert np.abs(a - b).max() > 1e-6  # params differ
    # and the train-only fit still round-trips
    f1 = t1.ScaleRevert()
    raw = _daily(spark, n=50).orderBy(DS).select(Y).toPandas()[Y].to_numpy()
    got = f1.tsf.df.orderBy(DS).select(Y).toPandas()[Y].to_numpy()
    assert np.abs(got - raw).max() < 1e-8


def test_get_mv_grids_skips_non_kernel_estimators():
    from scalecast_spark.grids import get_mv_grids

    g = get_mv_grids()
    assert "lags" in g["mlr"] and "lags" in g["ridge"]
    for name in ("hwes", "theta"):
        if name in g:
            assert "lags" not in g[name]


def test_mvpipeline_two_model_steps_keep_history(spark):
    """Review finding: a second MV model step must not drop models
    banked by the first."""
    from scalecast_spark.pipeline import MVPipeline

    def step_a(mvf):
        mvf.set_estimator("mv_mlr")
        mvf.manual_forecast(lags=2, call_me="first")

    def step_b(mvf):
        mvf.set_estimator("mv_ridge")
        mvf.manual_forecast(lags=2, alpha=0.5, call_me="second")

    p = MVPipeline(steps=[("A", step_a), ("B", step_b)])
    f1 = Forecaster(_daily(spark, sids=("a",), seed=1), future_dates=3)
    f2 = Forecaster(_daily(spark, sids=("b",), seed=2), future_dates=3)
    g1, g2 = p.fit_predict(f1, f2)
    for g in (g1, g2):
        assert sorted(g.history) == ["first", "second"]
        assert g.history["first"]["forecast"].count() == 3
