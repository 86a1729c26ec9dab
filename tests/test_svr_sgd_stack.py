"""SVR/SGD estimators + mlp_stack."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.selection import mlp_stack
from scalecast_spark.sources import load_table, events_to_series


def test_svr_fits_linear_with_outliers():
    from scalecast_spark.models.svr_sgd import make_fit_linear_svr

    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, (200, 1))
    y = 3.0 * X[:, 0] + 1.0 + rng.randn(200) * 0.05
    y[:5] += 50  # outliers; epsilon-insensitive loss shrugs them off
    predict = make_fit_linear_svr(C=1.0, epsilon=0.1, n_iter=500)(X, y)
    grid = np.array([[-1.0], [0.0], [1.0]])
    pred = predict(grid)
    expected = 3.0 * grid[:, 0] + 1.0
    assert np.allclose(pred, expected, atol=1.5)


def test_sgd_matches_ols_direction():
    from scalecast_spark.models.svr_sgd import make_fit_sgd

    rng = np.random.RandomState(1)
    X = rng.randn(300, 2)
    y = 2.0 * X[:, 0] - 1.0 * X[:, 1] + 5.0 + rng.randn(300) * 0.1
    predict = make_fit_sgd(alpha=1e-5, n_iter=2000)(X, y)
    pred = predict(X)
    assert np.corrcoef(pred, y)[0, 1] > 0.99


def test_svr_sgd_through_registry(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=5)
    f.set_test_length(5)
    f.add_ar_terms(2).add_time_trend()
    for est in ("svr", "sgd"):
        f.set_estimator(est)
        f.manual_forecast(call_me=est)
    summ = {r["ModelNickname"]: r for r in f.export("model_summaries").collect()}
    assert summ["svr"]["TestSetRMSE"] > 0
    assert summ["sgd"]["TestSetRMSE"] > 0


def test_mlp_stack(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=5)
    f.set_test_length(5)
    f.add_ar_terms(2)
    f.set_estimator("naive"); f.manual_forecast(m=7, call_me="snaive")
    f.set_estimator("theta"); f.manual_forecast(call_me="theta")
    mlp_stack(f, ["snaive", "theta"], epochs=150)
    assert "mlp_stack" in f.history
    assert f.history["mlp_stack"]["summary"]["TestSetRMSE"] > 0
    fc = f.history["mlp_stack"]["forecast"]
    assert fc.filter(F.col("forecast").isNotNull()).count() == 25


def test_rbf_svr_beats_linear_on_nonlinear_target():
    from scalecast_spark.models.svr_sgd import (
        make_fit_rbf_svr,
        make_fit_linear_svr,
    )

    rng = np.random.RandomState(2)
    X = rng.uniform(-3, 3, (400, 1))
    y = np.sin(2.0 * X[:, 0]) + rng.randn(400) * 0.05
    grid = np.linspace(-2.5, 2.5, 50).reshape(-1, 1)
    truth = np.sin(2.0 * grid[:, 0])
    rbf = make_fit_rbf_svr(C=10.0, epsilon=0.01, rff_dim=128, n_iter=800)(X, y)
    lin = make_fit_linear_svr(C=10.0, epsilon=0.01, n_iter=800)(X, y)
    rbf_mse = float(np.mean((rbf(grid) - truth) ** 2))
    lin_mse = float(np.mean((lin(grid) - truth) ** 2))
    assert rbf_mse < lin_mse / 4  # rbf captures the curvature
    assert rbf_mse < 0.1


def test_svr_kernel_param_through_registry_and_grid(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=3)
    f.set_test_length(4)
    f.add_ar_terms(2)
    f.set_estimator("svr")
    f.ingest_grid({"kernel": ["linear", "rbf"], "C": [1.0]})
    assert f._grid_cells(False) is not None  # batched CV covers kernel axis
    f.cross_validate(k=2, test_length=4)
    assert f.best_params["kernel"] in ("linear", "rbf")
    f.manual_forecast(**f.best_params, call_me="svr_cv")
    assert "svr_cv" in f.history
