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
    mu, ar, ma, resid = _hannan_rissanen(y, 1, 0)
    assert ar[0][0] == 1  # (lag, coef) pairs
    assert ar[0][1] == pytest.approx(phi, abs=0.05)


def test_ma1_coefficient_recovery():
    rng = np.random.RandomState(1)
    n, theta = 4000, 0.6
    e = rng.randn(n + 1)
    y = e[1:] + theta * e[:-1]
    mu, ar, ma, resid = _hannan_rissanen(y, 0, 1)
    assert ma[0][0] == 1
    assert ma[0][1] == pytest.approx(theta, abs=0.08)


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


def test_sarima_closed_form_snaive_drift():
    """(0,1,0)(0,1,0,7): with all ARMA orders zero the forecast has the
    closed form ŷ(n+i) = y[n-1] + y[n-8+i] - y[n-8] + i·μ (0-based;
    μ = mean of the doubly-differenced series) — the same identity the
    ts_arima oracle replays in SQL."""
    rng = np.random.RandomState(7)
    y = np.cumsum(rng.randn(120)) + 50
    dd = np.diff(y)[7:] - np.diff(y)[:-7]
    mu, n = dd.mean(), len(y)
    expect = np.array(
        [y[n - 1] + y[n - 8 + i] - y[n - 8] + i * mu for i in range(1, 8)]
    )
    _, fc = arima_fit_forecast(y, 7, (0, 1, 0), (0, 1, 0, 7))
    assert np.allclose(fc, expect, atol=1e-9)
    # h > m chains seasonal references through prior forecasts
    _, fc10 = arima_fit_forecast(y, 10, (0, 1, 0), (0, 1, 0, 7))
    assert np.allclose(fc10[:7], fc)


def test_seasonal_ar_beats_plain_on_sar_process():
    """True SAR(1) at lag 7 (a sinusoid would be unfair — any AR(2)
    predicts it exactly); the seasonal lag is the only structure, so
    the seasonal fit must win and recover phi_7 ~ 0.8."""
    rng = np.random.RandomState(8)
    n = 400
    y = np.zeros(n)
    for t in range(7, n):
        y[t] = 0.8 * y[t - 7] + rng.randn()
    tr, te = y[: n - 7], y[n - 7:]
    _, fc_s = arima_fit_forecast(tr, 7, (0, 0, 0), (1, 0, 0, 7))
    _, fc_p = arima_fit_forecast(tr, 7, (2, 0, 0))
    rmse = lambda f: float(np.sqrt(np.mean((f - te) ** 2)))  # noqa: E731
    assert rmse(fc_s) < rmse(fc_p)
    mu, ar, _, _ = _hannan_rissanen(tr, 0, 0, P=1, Q=0, m=7)
    assert ar[0][0] == 7 and ar[0][1] == pytest.approx(0.8, abs=0.1)


def test_seasonal_ma_lags_present():
    mu, ar, ma, _ = _hannan_rissanen(
        np.random.RandomState(9).randn(400), 1, 1, P=1, Q=1, m=7
    )
    assert [l for l, _ in ar] == [1, 7]
    assert [l for l, _ in ma] == [1, 7]


def test_arima_exog_regression_recovery():
    """Regression-with-ARIMA-errors: y = 3x + 5 + small noise; the
    forecast must track the FUTURE exog values, not the history."""
    rng = np.random.RandomState(10)
    x = rng.randn(150)
    y = 3.0 * x + 5.0 + 0.1 * rng.randn(150)
    xf = rng.randn(7)
    _, fc = arima_fit_forecast(
        y, 7, (1, 0, 0), X=x.reshape(-1, 1), Xf=xf.reshape(-1, 1)
    )
    assert np.allclose(fc, 3.0 * xf + 5.0, atol=0.3)
    # missing future exog fails loudly instead of extrapolating garbage
    with pytest.raises(ValueError):
        arima_fit_forecast(y, 7, (1, 0, 0), X=x.reshape(-1, 1))


def test_sarima_exog_through_forecaster(spark, sf_dir):
    """Spark-level seasonal + exog path: calendar features become exog
    columns whose future rows feed the forecast."""
    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=7)
    f.set_test_length(7)
    f.add_seasonal_regressors("dayofweek", dummy=True)
    f.set_estimator("arima")
    f.manual_forecast(
        order=(1, 0, 0), seasonal_order=(0, 1, 0, 7),
        Xvars="all", call_me="sarimax",
    )
    summ = {r["ModelNickname"]: r for r in f.export("model_summaries").collect()}
    assert summ["sarimax"]["TestSetRMSE"] > 0
    fc = f.export("lvl_fcsts").filter(
        (F.col("model") == "sarimax") & F.col("forecast").isNotNull()
    )
    # every series carries a full 7-step horizon
    per_series = [r["n"] for r in fc.groupBy("series_id").agg(
        F.count("*").alias("n")).collect()]
    assert per_series and all(n == 7 for n in per_series)


def test_sarima_matches_statsmodels_when_available():
    """Seasonal parity harness: Hannan-Rissanen additive-seasonal fit
    vs statsmodels exact MLE on a strong weekly SAR(1). Skips
    in-container (package absent)."""
    sm = pytest.importorskip("statsmodels.api")

    rng = np.random.RandomState(11)
    n = 400
    y = np.zeros(n)
    for t in range(7, n):
        y[t] = 0.8 * y[t - 7] + rng.randn() * 0.5
    _, fc = arima_fit_forecast(y, 7, (0, 0, 0), (1, 0, 0, 7))
    ref = sm.tsa.ARIMA(
        y, order=(0, 0, 0), seasonal_order=(1, 0, 0, 7)
    ).fit().forecast(7)
    assert np.allclose(fc, np.asarray(ref), atol=0.35)


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


def test_seasonal_strength_detects_seasonality():
    from scalecast_spark.models.arima import _seasonal_strength

    t = np.arange(140)
    rng = np.random.RandomState(3)
    seasonal = 10.0 * np.sin(2 * np.pi * t / 7) + 0.2 * rng.randn(140)
    noise = rng.randn(140)
    assert _seasonal_strength(seasonal, 7) > 0.9
    assert _seasonal_strength(noise, 7) < 0.5
    assert _seasonal_strength(noise, 1) == 0.0  # m=1 -> no seasonality
    assert _seasonal_strength(noise[:10], 7) == 0.0  # too short


def test_auto_arima_seasonal_search():
    """m>1: D picked by seasonal strength, seasonal AR/MA terms in the
    AIC grid, and the chosen model forecasts the periodic pattern."""
    from scalecast_spark.models.arima import arima_fit_forecast, auto_arima_orders

    t = np.arange(140)
    rng = np.random.RandomState(5)
    y = 20.0 + 8.0 * np.sin(2 * np.pi * t / 7) + 0.3 * rng.randn(140)
    order, seasonal = auto_arima_orders(y, m=7)
    P, D, Q, m = seasonal
    assert m == 7 and D == 1  # strong weekly pattern -> seasonal diff
    _, fc = arima_fit_forecast(y, 14, order, seasonal)
    # forecast continues the weekly shape: correlate with ground truth
    truth = 20.0 + 8.0 * np.sin(2 * np.pi * np.arange(140, 154) / 7)
    assert np.corrcoef(fc, truth)[0, 1] > 0.95
    # plain call remains a 3-tuple (backward compatible)
    o = auto_arima_orders(y[:60])
    assert isinstance(o, tuple) and len(o) == 3


def test_prophet_extra_regressors():
    """prophet add_regressor parity: a strong covariate the trend and
    Fourier terms cannot express must cut error when supplied."""
    from scalecast_spark.models.arima import prophet_fit_forecast

    rng = np.random.RandomState(13)
    n, h = 100, 10
    x = rng.randn(n + h)  # aperiodic exog
    y = 10.0 + 0.2 * np.arange(n) + 4.0 * x[:n] + 0.1 * rng.randn(n)
    truth = 10.0 + 0.2 * np.arange(n, n + h) + 4.0 * x[n:]
    _, fc_plain = prophet_fit_forecast(y, h)
    _, fc_exog = prophet_fit_forecast(
        y, h, X=x[:n, None], Xf=x[n:, None]
    )
    assert np.mean((fc_exog - truth) ** 2) < 0.25 * np.mean((fc_plain - truth) ** 2)
    with pytest.raises(ValueError, match="future"):
        prophet_fit_forecast(y, h, X=x[:n, None], Xf=None)


def test_prophet_exog_h0_fitted_only():
    from scalecast_spark.models.arima import prophet_fit_forecast

    rng = np.random.RandomState(1)
    x = rng.randn(50)
    y = 2.0 + 3.0 * x + 0.05 * rng.randn(50)
    fitted, fc = prophet_fit_forecast(y, 0, X=x[:, None])
    assert len(fitted) == 50 and len(fc) == 0
