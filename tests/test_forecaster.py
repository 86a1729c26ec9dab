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


def test_copy_isolates_mutations(f):
    """Forecaster.copy (reference _Forecaster_parent.py:154): frames
    shared (immutable), mutable state isolated — feature mutations,
    estimator choice, and history banking on the copy never leak back,
    and the copy's history entries are live independently."""
    g = f.copy()
    base_feats = list(f.tsf.features)
    g.add_ar_terms(4)
    assert list(f.tsf.features) == base_feats
    assert "ar_4" in g.tsf.features
    g.set_estimator("naive")
    g.manual_forecast(m=7)
    assert "naive" in g.history and "naive" not in f.history
    assert g.history["naive"]["forecast"].count() > 0
    # deeper: banking a model under a name already in the ORIGINAL's
    # history must not mutate the original's entry dict
    f.set_estimator("naive")
    f.manual_forecast(m=7, call_me="orig")
    h = f.copy()
    h.history["orig"]["summary"] = {"clobbered": True}
    assert "clobbered" not in f.history["orig"]["summary"]


def test_pipeline_copy_rebinds_reverter(spark, sf_dir):
    """Pipeline.copy (reference Pipeline.py:166-176): the copy's
    Reverter binds to the COPY's transformer, so fitting the copy
    reverts through the copy's fitted state, and re-fitting the copy
    on different data never clobbers the original's fitted params."""
    from scalecast_spark.frame import IS_FUTURE, Y
    from scalecast_spark.operators.transforms import ScaleTransform
    from scalecast_spark.pipeline import Pipeline, Reverter, Transformer
    from scalecast_spark.sources import events_to_series, load_table

    series = events_to_series(load_table(spark, sf_dir, "events"))
    df = series.withColumn(IS_FUTURE, F.lit(0))

    t = Transformer([ScaleTransform()])
    p = Pipeline([
        ("transform", t),
        ("model", lambda d: d.withColumn("forecast", F.col(Y))),
        ("revert", Reverter(t)),
    ])
    q = p.copy()
    # identity model -> fit_predict must round-trip y exactly on BOTH
    got_p = p.fit_predict(df)
    got_q = q.fit_predict(df)
    for got in (got_p, got_q):
        bad = got.filter(F.abs(F.col("forecast") - F.col(Y)) > 1e-9).count()
        assert bad == 0
    # structural isolation: the copy's steps are distinct objects and
    # its reverter points at ITS transformer, not the original's
    (tp, mp, rp), (tq, mq, rq) = (
        [s for _, s in p.steps], [s for _, s in q.steps]
    )
    assert tq is not tp and rq is not rp
    assert rq.base is tq and rp.base is tp
    assert mq is mp  # model callables shared by design


def test_reference_parity_utilities(f):
    """The round-11b reference-parity surface: introspection utils,
    drop policies, metric selection, horizon-by-date, and the frame
    exports behave per the reference's documented semantics."""
    # AR introspection
    assert f.list_stored_ar_terms() == ["ar_1", "ar_2"]
    assert f.get_max_lag_order() == 2
    assert f.n_actuals() > 0
    assert f.get_freq() == 86400.0  # daily testdata

    # drop policies
    with pytest.raises(ValueError, match="not found"):
        f.drop_regressors("nope")
    g = f.copy()
    g.drop_regressors("nope", raise_error=False)  # silent skip
    g.drop_regressors("t")
    assert "t" not in g.tsf.features and "t" in f.tsf.features
    g.drop_all_Xvars()
    assert list(g.tsf.features) == [] and f.tsf.features

    # metric selection validates against the registry
    g = f.copy()
    g.set_metrics(["rmse", "mae"])
    assert g.metrics == ["rmse", "mae"]
    g.set_metrics(["r2"], keep_existing=True)
    assert g.metrics == ["rmse", "mae", "r2"]
    with pytest.raises(ValueError, match="unknown metric"):
        g.set_metrics(["nope"])

    # Xvars export: dropna removes every row carrying a NULL feature
    # cell (warm-up AR rows; far-horizon future rows beyond the lag
    # reach — near-horizon ones keep real lag values and survive)
    x = f.export_Xvars_df()
    assert "ar_1" in x.columns
    assert x.filter("is_future = 1").count() > 0
    clean = f.export_Xvars_df(dropna=True)
    assert clean.count() < x.count()
    feats = [c for c in clean.columns if c not in ("series_id", "ds", "is_future")]
    null_rows = clean.filter(" OR ".join(f"{c} IS NULL" for c in feats)).count()
    assert null_rows == 0


def test_reference_parity_test_and_cis(f):
    """f.test(): out-of-sample-only evaluation banks TestSet metrics +
    test predictions without a future forecast; eval_cis enforces the
    conformal soundness bound and its off-mode skips interval math."""
    g = f.copy()
    g.set_estimator("naive")
    g.test(m=7, call_me="naive_t")
    h = g.history["naive_t"]
    assert h["forecast"] is None and h["fitted"] is None
    assert h["test_preds"].count() > 0
    assert "TestSetRMSE" in h["summary"]
    # merge semantics: manual_forecast then test UPDATES the entry
    g.manual_forecast(m=7, call_me="naive_full")
    rmse_full = g.history["naive_full"]["summary"]["TestSetRMSE"]
    g.test(m=7, call_me="naive_full")
    assert g.history["naive_full"]["forecast"] is not None  # kept
    assert g.history["naive_full"]["summary"]["TestSetRMSE"] == pytest.approx(
        rmse_full, rel=1e-9
    )

    # eval_cis soundness bound: cilevel .95 needs >= 20 test obs
    with pytest.raises(ValueError, match="at least 20"):
        g.eval_cis(cilevel=0.95)
    g.eval_cis(cilevel=0.9, mode=False)  # off: no bound enforced
    g.set_estimator("naive")
    g.manual_forecast(m=7, call_me="no_cis")
    fc = g.history["no_cis"]["forecast"]
    assert "lower" not in fc.columns  # intervals skipped when off
    # back on with a satisfiable level (test_length 7 >= 1/(1-.85)=7)
    g.eval_cis(cilevel=0.85)
    g.manual_forecast(m=7, call_me="with_cis")
    assert "lower" in g.history["with_cis"]["forecast"].columns


def test_reference_parity_restore_and_horizon(f):
    """restore_series_length undoes keep_smaller_history and drops all
    Xvars (reference semantics); set_last_future_date extends every
    series' horizon to cover the target date."""
    g = f.copy()
    n0 = g.n_actuals()
    g.keep_smaller_history(15)
    assert g.n_actuals() == 15
    g.restore_series_length()
    assert g.n_actuals() == n0
    assert list(g.tsf.features) == []  # regressors dropped with the restore
    g.restore_series_length()  # idempotent no-op

    import pandas as pd

    last = pd.Timestamp(
        g.tsf.observed.agg(F.max("ds")).collect()[0][0]
    )
    target = last + pd.Timedelta(days=10)
    g.set_last_future_date(target)
    fut_max = pd.Timestamp(
        g.tsf.df.filter("is_future = 1").agg(F.max("ds")).collect()[0][0]
    )
    assert fut_max >= target
    with pytest.raises(ValueError, match="not after"):
        g.set_last_future_date(last - pd.Timedelta(days=1))


def test_add_sklearn_estimator_and_normalizer(f):
    """User extensibility (reference add_sklearn_estimator /
    add_normalizer): a duck-typed fit/predict regressor class
    registers, forecasts through the kernel like a built-in (per-series
    fit, recursive future prediction), and a custom scaler class
    registers as a normalizer. A pure-numpy mean regressor keeps the
    test package-free."""
    import numpy as np

    class MeanReg:
        def __init__(self, bump=0.0):
            self.bump = bump

        def fit(self, X, y):
            self.mu = float(np.mean(y))

        def predict(self, X):
            return np.full(len(np.atleast_2d(X)), self.mu + self.bump)

    class IdentScaler:
        def fit(self, X):
            return self

        def transform(self, X):
            return X

    g = f.copy()
    g.add_sklearn_estimator(MeanReg, "meanreg")
    g.add_normalizer("ident", IdentScaler)
    g.set_estimator("meanreg")
    g.manual_forecast(call_me="mr", bump=1.0, normalizer="ident")
    fc = g.history["mr"]["forecast"].toPandas()
    assert len(fc) > 0 and fc["forecast"].notna().all()
    # per-series constant: forecast == TRAIN mean + bump everywhere
    # (the kernel trains on feature-complete rows only, so the AR
    # warm-up head is excluded from the mean)
    obs = g.tsf.observed.filter(
        "ar_1 IS NOT NULL AND ar_2 IS NOT NULL"
    ).groupBy("series_id").agg(
        F.avg("y").alias("mu")
    ).toPandas().set_index("series_id")["mu"]
    for sid, grp in fc.groupby("series_id"):
        assert np.allclose(grp["forecast"], obs[sid] + 1.0, atol=1e-9)
    # hyperparams flow through tuning grids like a built-in
    g.ingest_grid({"bump": [0.0, 5.0]})
    g.tune()
    assert g.best_params["bump"] == 0.0  # less bias wins validation
    # STL wrapper returns the decomposition frame
    stl = g.STL(m=7)
    assert {"trend", "seasonal"} <= set(c.lower() for c in stl.columns)
    # feature importance banks lazily and exports
    g.save_feature_importance("mr")
    assert g.export_feature_importance("mr").count() > 0
    g.manual_forecast(call_me="mr_plain", normalizer=None)
    with pytest.raises(ValueError, match="no feature importance"):
        g.export_feature_importance("mr_plain")
    assert not g.determine_if_MVForecaster()
    g.validate_regressor_names(["ar_1"])
    with pytest.raises(ValueError, match="not stored"):
        g.validate_regressor_names(["nope"])


def test_grids_file_lookup(f, tmp_path, monkeypatch):
    """ingest_grid(str): the reference Grids-file contract — look the
    named grid up in the set_grids_file module first, then fall back
    to the engine DEFAULT_GRIDS; unknown names fail loudly."""
    import sys

    (tmp_path / "MyGrids.py").write_text("special = {'alpha': [0.5, 2.0]}\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    g = f.copy()
    g.set_grids_file("MyGrids")
    g.ingest_grid("special")
    assert g.grid == [{"alpha": 0.5}, {"alpha": 2.0}]
    g.ingest_grid("mlr")  # falls back to DEFAULT_GRIDS
    assert g.grid
    with pytest.raises(ValueError, match="no grid named"):
        g.ingest_grid("nope")
    sys.modules.pop("MyGrids", None)


def test_mv_surface_on_forecaster(f):
    """MVForecaster compatibility: the name imports (r12: a subclass
    honoring the reference's multi-Forecaster constructor — no longer
    a bare alias), every MV method lives on plain Forecaster, corr
    returns the full pairwise matrix with unit diagonal, train_only
    trims the test slice (values change when the tail is excluded),
    and corr_lags produces one row per lag."""
    from scalecast_spark import Forecaster, MVForecaster

    assert issubclass(MVForecaster, Forecaster)
    assert isinstance(f, Forecaster)
    # the whole MV surface exists on the base class (long format)
    for m in ("corr", "corr_lags", "set_optimize_on"):
        assert hasattr(f, m)
    c = f.corr().toPandas()
    sids = set(c["series_a"])
    assert len(c) == len(sids) ** 2
    diag = c[c["series_a"] == c["series_b"]]["corr"]
    assert (diag == 1.0).all()
    c_tr = f.corr(train_only=True).toPandas()
    assert len(c_tr) == len(c)
    lags = f.corr_lags(sorted(sids)[0], sorted(sids)[1], lags=3).toPandas()
    assert list(lags["lag"]) == [1, 2, 3]
    assert lags["corr"].abs().le(1.0).all()
