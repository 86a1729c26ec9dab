"""ARIMA family: recover known AR/MA processes, reintegration, auto order."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.models.arima import (
    arima_fit_forecast,
    auto_arima_orders,
    _hannan_rissanen,
)
from scalecast_spark.sources import load_table, events_to_series


def test_ar1_coefficient_recovery():
    rng = np.random.RandomState(0)
    n, phi = 2000, 0.7
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = phi * y[t - 1] + rng.randn()
    mu, phi_hat, theta, resid = _hannan_rissanen(y, 1, 0)
    assert phi_hat[0] == pytest.approx(phi, abs=0.05)


def test_ma1_coefficient_recovery():
    rng = np.random.RandomState(1)
    n, theta = 4000, 0.6
    e = rng.randn(n + 1)
    y = e[1:] + theta * e[:-1]
    mu, phi, theta_hat, resid = _hannan_rissanen(y, 0, 1)
    assert theta_hat[0] == pytest.approx(theta, abs=0.08)


def test_arima_d1_reintegrates_trend():
    # y = linear trend + AR(1) noise; ARIMA(1,1,0) forecast keeps the trend
    rng = np.random.RandomState(2)
    n = 300
    noise = np.zeros(n)
    for t in range(1, n):
        noise[t] = 0.5 * noise[t - 1] + rng.randn() * 0.3
    y = 2.0 * np.arange(n) + 10 + noise
    fitted, fc = arima_fit_forecast(y, 5, order=(1, 1, 0))
    assert len(fitted) == n and len(fc) == 5
    # forecast continues at roughly slope 2/step
    assert fc[0] == pytest.approx(y[-1] + 2.0, abs=2.0)
    assert (fc[4] - fc[0]) == pytest.approx(8.0, abs=3.0)
    # in-sample fit tracks the series
    assert np.corrcoef(fitted[10:], y[10:])[0, 1] > 0.999


def test_auto_arima_detects_differencing():
    rng = np.random.RandomState(3)
    walk = np.cumsum(rng.randn(500))
    p, d, q = auto_arima_orders(walk, max_p=2, max_d=1, max_q=1)
    assert d == 1


def test_arima_through_forecaster(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=7)
    f.set_test_length(7)
    f.set_estimator("arima"); f.manual_forecast(order=(2, 0, 1))
    f.set_estimator("auto_arima"); f.manual_forecast(max_p=2, max_q=1)
    summ = {r["ModelNickname"]: r for r in f.export("model_summaries").collect()}
    assert summ["arima"]["TestSetRMSE"] > 0
    assert summ["auto_arima"]["TestSetRMSE"] > 0


def test_prophet_tbats_no_longer_gated(spark, sf_dir):
    """prophet/tbats now run everywhere: the real packages when
    installed, numpy additive-model / TBATS cores otherwise."""
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=3)
    for name in ("prophet", "tbats"):
        f.set_estimator(name)
        f.manual_forecast(call_me=name)
    assert {"prophet", "tbats"} <= set(f.history)


def test_arima_matches_statsmodels_when_available():
    """Exact-MLE parity harness (COVERAGE round-3 #2): when the gated
    statsmodels backend exists, our Hannan-Rissanen AR(1) forecast must
    land near the MLE answer. Skips in-container (package absent)."""
    import numpy as np
    import pytest

    sm = pytest.importorskip("statsmodels.api")
    from scalecast_spark.models.arima import arima_fit_forecast

    rng = np.random.RandomState(3)
    y = np.zeros(300)
    for t in range(1, 300):
        y[t] = 5.0 + 0.7 * (y[t - 1] - 5.0) + rng.randn() * 0.5
    _, fc = arima_fit_forecast(y, 5, order=(1, 0, 0))
    ref = sm.tsa.ARIMA(y, order=(1, 0, 0)).fit().forecast(5)
    assert np.allclose(fc, np.asarray(ref), atol=0.2)


def test_prophet_fallback_captures_trend_and_weekly_cycle():
    import numpy as np

    from scalecast_spark.models.arima import prophet_fit_forecast

    rng = np.random.RandomState(4)
    n = 120
    t = np.arange(n)
    y = 50 + 0.5 * t + 8 * np.sin(2 * np.pi * t / 7) + rng.randn(n) * 0.3
    fitted, fc = prophet_fit_forecast(y, 14)
    assert len(fitted) == n and len(fc) == 14
    tf = np.arange(n, n + 14)
    truth = 50 + 0.5 * tf + 8 * np.sin(2 * np.pi * tf / 7)
    assert float(np.sqrt(np.mean((fc - truth) ** 2))) < 2.0


def test_tbats_fallback_positive_seasonal_series():
    import numpy as np

    from scalecast_spark.models.arima import tbats_fit_forecast

    rng = np.random.RandomState(5)
    n = 100
    t = np.arange(n)
    y = np.exp(0.01 * t) * (10 + 2 * np.sin(2 * np.pi * t / 7)) + rng.rand(n)
    fitted, fc = tbats_fit_forecast(y, 7)
    assert len(fitted) == n and len(fc) == 7
    assert np.all(fc > 0)  # inverse Box-Cox keeps the positive domain
    # weekly phase should persist: the forecast's max/min gap is real
    assert fc.max() - fc.min() > 1.0


def test_prophet_tbats_through_registry(spark, sf_dir):
    from scalecast_spark import Forecaster
    from scalecast_spark.sources import load_table, events_to_series

    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=5)
    f.set_test_length(5)
    for est in ("prophet", "tbats"):
        f.set_estimator(est)
        f.manual_forecast(call_me=est)
    summ = {r["ModelNickname"]: r for r in f.export("model_summaries").collect()}
    assert summ["prophet"]["TestSetRMSE"] > 0
    assert summ["tbats"]["TestSetRMSE"] > 0
