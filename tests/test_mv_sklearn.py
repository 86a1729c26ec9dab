"""Generic multivariate wide-lag kernel (models/mv_kernel.py) — the
full SKLearnMV surface (reference models.py:164-420: MVForecaster
re-wraps the entire sklearn family; test/test_MVForecaster.py:39-107
sweeps rf/gbt/etc. through it). The linear member stays the
hash-matched driver-gate core (mv_linear); these tests pin the
generalization: same design layout, same joint recursion, any kernel
estimator."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.models import KERNEL_FACTORIES, MODELS
from scalecast_spark.models.mv_kernel import (
    mv_design,
    mv_fit_forecast,
    mv_model,
)
from scalecast_spark.models.mv_linear import mv_linear_fit_forecast


def _ymat(T=40, n=3, seed=0):
    rng = np.random.RandomState(seed)
    base = np.cumsum(rng.randn(T, 1), axis=0)
    return base + rng.randn(T, n) * 0.3 + np.arange(n) * 5.0


def test_ridge_member_matches_closed_form():
    """mv_fit_forecast with the kernel ridge must reproduce
    mv_linear_fit_forecast: centered-Gram ridge with unpenalized
    intercept and augmented-column ridge with unpenalized intercept
    are the same estimator."""
    Y = _ymat()
    f1, fc1 = mv_linear_fit_forecast(Y, 7, lags=2, alpha=5.0)
    f2, fc2 = mv_fit_forecast(Y, 7, 2, KERNEL_FACTORIES["ridge"](alpha=5.0))
    assert np.allclose(fc1, fc2, atol=1e-7)
    assert np.allclose(f1, f2, atol=1e-7)


def test_knn_joint_recursion_vs_pure_numpy():
    """The knn member against an independent recompute of the exact
    semantics: squared-euclidean k-NN per step, every step's joint
    prediction appended to the history before the next step."""
    Y = _ymat(T=30, n=2, seed=1)
    L, k, h = 2, 3, 4
    _, fc = mv_fit_forecast(Y, h, L, KERNEL_FACTORIES["knn"](n_neighbors=k))

    X, Yt = mv_design(Y, L)
    hist = Y.copy()
    for step in range(h):
        x = np.array(
            [hist[-(c // 2 + 1), c % 2] for c in range(2 * L)], dtype=float
        )
        d = ((X - x) ** 2).sum(axis=1)
        idx = np.argsort(d, kind="stable")[:k]
        nxt = Yt[idx].mean(axis=0)
        assert np.allclose(fc[step], nxt, atol=1e-12)
        hist = np.vstack([hist, nxt])


def test_recursion_feeds_back_across_series():
    """Joint semantics, not per-series: perturbing ONLY series 0's
    history must move series 1's step-2+ forecast (series 1 sees
    series 0's step-1 prediction through its lag vector)."""
    Y = _ymat(T=30, n=2, seed=2)
    fit = KERNEL_FACTORIES["knn"](n_neighbors=3)
    _, fc = mv_fit_forecast(Y, 3, 2, fit)
    Yp = Y.copy()
    Yp[-1, 0] += Y[:, 0].std() * 3
    _, fcp = mv_fit_forecast(Yp, 3, 2, fit)
    assert not np.allclose(fc[1:, 1], fcp[1:, 1])


@pytest.mark.parametrize("est", ["rf", "gbt", "xgboost", "catboost", "mlp"])
def test_nonlinear_members_run_and_are_deterministic(est):
    Y = _ymat(T=35, n=2, seed=3)
    kw = {"n_estimators": 10} if est != "mlp" else {"epochs": 30}
    a = mv_fit_forecast(Y, 5, 2, KERNEL_FACTORIES[est](**kw))[1]
    b = mv_fit_forecast(Y, 5, 2, KERNEL_FACTORIES[est](**kw))[1]
    assert a.shape == (5, 2)
    assert np.isfinite(a).all()
    assert np.array_equal(a, b)  # seeded cores: bit-identical reruns


def test_mv_model_end_to_end_with_families(spark):
    """Distributed path: two independent families in one frame,
    forecasts land on every future row, and each family's numbers
    equal its standalone single-family run (family isolation)."""
    from scalecast_spark.frame import TimeSeriesFrame

    rows = []
    for fam, sids in [("a", ["x", "y"]), ("b", ["u", "v"])]:
        Y = _ymat(T=30, n=2, seed=ord(fam[0]))
        for j, sid in enumerate(sids):
            for i in range(30):
                rows.append(
                    {
                        "series_id": f"{fam}_{sid}",
                        "ds": pd.Timestamp("2024-01-01") + pd.Timedelta(days=i),
                        "y": float(Y[i, j]),
                        "fam": fam,
                    }
                )
    pdf = pd.DataFrame(rows)
    long = spark.createDataFrame(pdf)
    tsf = TimeSeriesFrame.from_long(
        long.select("series_id", "ds", "y")
    ).generate_future_dates(5)
    withfam = tsf.df.withColumn(
        "fam", F.split(F.col("series_id"), "_")[0]
    )
    out = mv_model(
        withfam, estimator="rf", lags=2, family_col="fam", n_estimators=10
    )
    fut = out.filter("is_future = 1")
    assert fut.filter(F.col("forecast").isNull()).count() == 0
    got = {
        (r["series_id"], r["ds"]): r["forecast"]
        for r in fut.collect()
    }
    # standalone family-a run must agree (no cross-family bleed)
    solo = mv_model(
        withfam.filter(F.col("fam") == "a"),
        estimator="rf", lags=2, n_estimators=10,
    )
    for r in solo.filter("is_future = 1").collect():
        assert got[(r["series_id"], r["ds"])] == pytest.approx(
            r["forecast"], abs=1e-12
        )


def test_registry_aliases_exist():
    for est in KERNEL_FACTORIES:
        assert f"mv_{est}" in MODELS
    assert "mv_sklearn" in MODELS


def test_unknown_estimator_raises(spark):
    with pytest.raises(ValueError, match="unknown estimator"):
        mv_model(spark.range(1), estimator="nope")


def test_mv_estimators_through_forecaster_api(spark, sf_dir):
    """The reference MVForecaster surface end-to-end: set_estimator on
    an mv_* alias -> manual_forecast -> TestSet metrics + optimize_on
    ranking + set_best_model, all through the standard Forecaster
    (the long format makes MV 'just more rows'; SURVEY §2 MV rows)."""
    from scalecast_spark import Forecaster
    from scalecast_spark.sources import events_to_series, load_table

    series = events_to_series(load_table(spark, sf_dir, "events"))
    fc = Forecaster(series, future_dates=7)
    fc.set_test_length(7)
    fc.set_estimator("mv_linear").manual_forecast(lags=2, alpha=5.0)
    fc.set_estimator("mv_rf").manual_forecast(
        lags=2, n_estimators=10, call_me="mv_rf10"
    )
    fc.set_estimator("mv_knn").manual_forecast(lags=2, n_neighbors=5)
    assert set(fc.history) == {"mv_linear", "mv_rf10", "mv_knn"}
    summ = {
        r["ModelNickname"]: r
        for r in fc.export("model_summaries").collect()
    }
    for m in fc.history:
        assert summ[m]["TestSetRMSE"] > 0
    fc.set_best_model(determine_best_by="TestSetRMSE")
    assert fc.best_model in fc.history
    fcsts = fc.export("lvl_fcsts")
    counts = {r["model"]: r["count"] for r in fcsts.groupBy("model").count().collect()}
    assert all(v == 7 * 5 for v in counts.values())


def test_mv_grid_tune_and_auto_forecast(spark, sf_dir):
    """MV estimators flow through the grid-tune -> auto_forecast loop
    (the reference MVForecaster tune/CV surface with optimize_on
    aggregation): the chosen cell comes from the ingested grid and
    the final forecast runs with it."""
    from scalecast_spark import Forecaster
    from scalecast_spark.sources import events_to_series, load_table

    series = events_to_series(load_table(spark, sf_dir, "events"))
    fc = Forecaster(series, future_dates=7)
    fc.set_test_length(7)
    fc.set_validation_length(7)
    fc.set_estimator("mv_knn")
    fc.ingest_grid({"lags": [2, 3], "n_neighbors": [3, 5]})
    fc.tune()
    assert fc.best_params["lags"] in (2, 3)
    assert fc.best_params["n_neighbors"] in (3, 5)
    fc.auto_forecast()
    assert fc.history["mv_knn"]["summary"]["TestSetRMSE"] > 0
    assert (
        fc.history["mv_knn"]["summary"]["hyperparams"]["n_neighbors"]
        == fc.best_params["n_neighbors"]
    )


def test_exog_design_matches_closed_form():
    """Ridge with exog == the closed-form augmented-design solve
    computed independently: design [wide-lags | x_t], multi-target."""
    rng = np.random.RandomState(4)
    Y = _ymat(T=40, n=2, seed=4)
    xg = rng.rand(40, 1) * 3.0
    Y = Y + 2.5 * xg  # real exog effect on both series
    xf = rng.rand(5, 1) * 3.0
    _, fc = mv_fit_forecast(
        Y, 5, 2, KERNEL_FACTORIES["ridge"](alpha=1.0),
        exog=xg, exog_future=xf,
    )
    # independent recompute: augmented design + unpenalized-intercept
    # ridge per target + joint recursion
    X, Yt = mv_design(Y, 2)
    Xa = np.hstack([X, xg[2:], np.ones((len(X), 1))])
    p = Xa.shape[1]
    pen = np.eye(p); pen[-1, -1] = 0.0
    B = np.linalg.solve(Xa.T @ Xa + pen, Xa.T @ Yt)
    hist = Y.copy()
    for step in range(5):
        x = np.array([hist[-(c // 2 + 1), c % 2] for c in range(4)])
        xa = np.concatenate([x, xf[step], [1.0]])
        nxt = xa @ B
        assert np.allclose(fc[step], nxt, atol=1e-8)
        hist = np.vstack([hist, nxt])


def test_exog_future_moves_the_forecast():
    Y = _ymat(T=40, n=2, seed=5)
    xg = np.linspace(0, 1, 40).reshape(-1, 1)
    Y = Y + 4.0 * xg
    fit = KERNEL_FACTORIES["ridge"](alpha=1.0)
    lo = mv_fit_forecast(Y, 3, 2, fit, exog=xg,
                         exog_future=np.zeros((3, 1)))[1]
    hi = mv_fit_forecast(Y, 3, 2, fit, exog=xg,
                         exog_future=np.ones((3, 1)) * 5.0)[1]
    assert (hi > lo).all()


def test_exog_validation_errors():
    Y = _ymat(T=20, n=2, seed=6)
    fit = KERNEL_FACTORIES["ridge"]()
    with pytest.raises(ValueError, match="one per observed"):
        mv_fit_forecast(Y, 2, 2, fit, exog=np.ones((5, 1)),
                        exog_future=np.ones((2, 1)))
    with pytest.raises(ValueError, match="exog_future"):
        mv_fit_forecast(Y, 2, 2, fit, exog=np.ones((20, 1)))


def test_mv_exog_through_spark_and_forecaster_default(spark, sf_dir):
    """features= flows into the shared-exog design on the distributed
    path, and the Forecaster does NOT silently feed per-series
    features to mv estimators (Xvars default None for mv_*)."""
    from scalecast_spark import Forecaster
    from scalecast_spark.frame import TimeSeriesFrame
    from scalecast_spark.operators.features import add_time_trend
    from scalecast_spark.sources import events_to_series, load_table

    series = events_to_series(load_table(spark, sf_dir, "events"))
    tsf = TimeSeriesFrame.from_long(series).generate_future_dates(7)
    df, _ = add_time_trend(tsf.df)
    out = mv_model(df, estimator="ridge", features=["t"], lags=2, alpha=1.0)
    fut = out.filter("is_future = 1")
    assert fut.filter(F.col("forecast").isNull()).count() == 0
    base = mv_model(df, estimator="ridge", lags=2, alpha=1.0)
    a = {(r["series_id"], r["ds"]): r["forecast"] for r in fut.collect()}
    b = {
        (r["series_id"], r["ds"]): r["forecast"]
        for r in base.filter("is_future = 1").collect()
    }
    assert a != b  # the exog column genuinely entered the design
    # Forecaster default: ar features exist but mv gets NO implicit Xvars
    fc = Forecaster(series, future_dates=7)
    fc.set_test_length(7)
    fc.add_ar_terms(2)
    fc.set_estimator("mv_linear").manual_forecast(lags=2, alpha=5.0)
    assert fc.history["mv_linear"]["summary"]["TestSetRMSE"] > 0


def test_mv_through_backtest_pipeline(spark, sf_dir):
    """MVPipeline parity (reference Pipeline.py:464-593 — long format
    makes combine/break no-ops): the MV kernel runs inside the
    rolling-origin backtest exactly like univariate estimators, and
    backtest_metrics aggregates it per (model, iteration)."""
    from scalecast_spark.models import MODELS
    from scalecast_spark.pipeline import backtest, backtest_metrics
    from scalecast_spark.sources import events_to_series, load_table

    series = events_to_series(load_table(spark, sf_dir, "events"))
    bt = backtest(
        series,
        {
            "mv_knn": lambda df: MODELS["mv_knn"](
                df, lags=2, n_neighbors=5
            ),
            "naive": lambda df: MODELS["naive"](df, m=7),
        },
        fcst_length=7,
        n_iter=2,
    )
    n_series = series.select("series_id").distinct().count()
    counts = {
        (r["model"], r["iteration"]): r["count"]
        for r in bt.groupBy("model", "iteration").count().collect()
    }
    assert set(counts) == {("mv_knn", 0), ("mv_knn", 1),
                           ("naive", 0), ("naive", 1)}
    assert all(v == 7 * n_series for v in counts.values())
    mets = backtest_metrics(bt, metrics=["rmse", "mae"]).toPandas()
    mv_rows = mets[mets["model"] == "mv_knn"]
    assert len(mv_rows) == 3  # 2 iterations + the average row
    assert mv_rows["rmse"].notna().all() and mv_rows["mae"].notna().all()
