"""Selection searches, tree/MLP estimators, recipe replay, persistence."""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.selection import (
    auto_Xvar_select,
    determine_best_series_length,
    reduce_Xvars,
    tune_test_forecast,
)
from scalecast_spark.sources import load_table, events_to_series


@pytest.fixture()
def f(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    fc = Forecaster(series, future_dates=7)
    fc.set_test_length(7).set_validation_length(7)
    fc.add_ar_terms(3).add_time_trend().add_seasonal_regressors(
        "dayofweek", raw=False, sincos=True
    )
    return fc


def test_gbt_rf_mlp_produce_forecasts(f):
    for est, kw in [("gbt", {"n_estimators": 15}), ("rf", {"n_estimators": 15}),
                    ("mlp", {"epochs": 100})]:
        f.set_estimator(est)
        f.manual_forecast(call_me=est, **kw)
    summ = {r["ModelNickname"]: r for r in f.export("model_summaries").collect()}
    for est in ("gbt", "rf", "mlp"):
        assert summ[est]["TestSetRMSE"] > 0


def test_gbt_fits_nonlinear():
    from scalecast_spark.models.trees import make_fit_gbt

    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, size=(300, 1))
    y = np.where(X[:, 0] > 0, 5.0, -5.0) + rng.randn(300) * 0.1
    predict = make_fit_gbt(40, 2, 0.2)(X, y)
    assert predict(np.array([[1.5]]))[0] == pytest.approx(5.0, abs=0.5)
    assert predict(np.array([[-1.5]]))[0] == pytest.approx(-5.0, abs=0.5)


def test_rf_deterministic():
    from scalecast_spark.models.trees import make_fit_rf

    rng = np.random.RandomState(1)
    X, y = rng.randn(100, 3), rng.randn(100)
    p1 = make_fit_rf(10, random_state=7)(X, y)(X[:5])
    p2 = make_fit_rf(10, random_state=7)(X, y)(X[:5])
    assert np.allclose(p1, p2)


def test_mlp_learns_linear():
    from scalecast_spark.models.mlp import make_fit_mlp

    rng = np.random.RandomState(2)
    X = rng.uniform(-1, 1, (200, 2))
    y = 3 * X[:, 0] - 2 * X[:, 1] + 1
    predict = make_fit_mlp(16, 600, 0.02)(X, y)
    pred = predict(X)
    assert np.corrcoef(pred, y)[0, 1] > 0.99


def test_rnn_now_backed_by_direct_mlp(f):
    """rnn/lstm are no longer stubs: the TF-free direct multi-horizon
    MLP backs them (see tests/test_direct_horizon.py); prophet now runs
    on its numpy additive-model core too."""
    f.set_estimator("rnn")
    f.manual_forecast(lags=5, hidden=4, epochs=50)
    assert "rnn" in f.history
    f.set_estimator("prophet")
    f.manual_forecast(call_me="prophet")
    assert "prophet" in f.history


def test_tune_test_forecast(f):
    tune_test_forecast(f, ["naive", "ridge"], cross_validate=False)
    assert {"naive", "ridge"} <= set(f.history)


def test_auto_xvar_select(f):
    chosen = auto_Xvar_select(f, estimator="mlr", max_ar=3)
    assert chosen, "should pick a nonempty feature set"
    assert set(chosen) <= {"ar_1", "ar_2", "ar_3", "t",
                           "dayofweeksin1", "dayofweekcos1",
                           "dayofweeksin2", "dayofweekcos2"}
    assert list(f.tsf.features) == chosen


def test_reduce_xvars(f):
    kept = reduce_Xvars(f, estimator="mlr", keep_at_least=2)
    assert len(kept) >= 2
    assert list(f.tsf.features) == kept


def test_determine_best_series_length(f):
    best = determine_best_series_length(
        f, estimator="naive", min_obs=10, step=10, chop=False, m=1
    )
    assert best >= 10


def test_recipe_replay(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    a = Forecaster(series, future_dates=5)
    a.add_ar_terms(2).add_time_trend()
    b = Forecaster(series, future_dates=5)
    b.apply_recipe(a.export_recipe())
    assert b.get_regressor_names() == a.get_regressor_names()


def test_save_load_results(spark, f, tmp_path):
    f.set_estimator("naive")
    f.manual_forecast(m=7)
    path = str(tmp_path / "results")
    f.save_results(path)
    loaded = Forecaster.load_results(spark, path)
    assert loaded["forecasts"].count() == 7 * 5
    assert loaded["summaries"].count() == 1


def test_pt_terms(f):
    f.add_pt_terms("t")
    assert "t_pt" in f.get_regressor_names()
    vals = f.tsf.df.select("t_pt").filter(F.col("t_pt").isNotNull()).count()
    assert vals > 0


def test_linear_shap_ranks_signal_above_noise(spark):
    """Exact linear SHAP (functions/shap.py): a feature with a real
    coefficient must out-rank a pure-noise feature."""
    import datetime as dt

    from scalecast_spark.functions.shap import linear_shap_importance

    rng = np.random.RandomState(7)
    rows = []
    d0 = dt.date(2024, 1, 1)
    for s in range(3):
        for i in range(60):
            x = float(i % 9)
            noise = float(rng.randn())
            y = 3.0 * x + 0.5 * s + rng.randn() * 0.1
            rows.append((f"s{s}", d0 + dt.timedelta(days=i), y, 0, x, noise))
    df = spark.createDataFrame(
        rows,
        schema="series_id string, ds date, y double, is_future int,"
               " x double, noise double",
    )
    imp = {
        r["feature"]: r["importance"]
        for r in linear_shap_importance(df, ["x", "noise"]).collect()
    }
    assert imp["x"] > 10 * imp["noise"]


def test_reduce_xvars_shap(f):
    kept = reduce_Xvars(f, estimator="mlr", keep_at_least=2, method="shap")
    assert len(kept) >= 2
    assert list(f.tsf.features) == kept
    with pytest.raises(ValueError):
        reduce_Xvars(f, estimator="gbt", method="shap")
