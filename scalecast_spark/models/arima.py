"""ARIMA-family estimator in numpy (reference 'arima' wrapper,
models.py:1150-1273, over statsmodels; 'auto_arima' order search,
auxmodels.py:6-45, over pmdarima — neither library exists in this
container).

Estimation is the classic two-stage Hannan-Rissanen procedure (public
algorithm; see Brockwell & Davis, *Time Series: Theory and Methods*):

  1. difference d times;
  2. fit a long AR by OLS to proxy the innovations;
  3. regress y_t on p AR lags and q lagged innovation proxies (OLS);
  4. forecast recursively, reintegrating the d differences.

Exact MLE (statsmodels) differs in the low-order terms; when
statsmodels IS installed it is used instead (import-gated), keeping
bit-parity optional and the core dependency-free. Runs per series in
run_series_kernel — parallel across series.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from scalecast_spark.models.kernel import run_series_kernel


def _hannan_rissanen(y: np.ndarray, p: int, q: int):
    n = len(y)
    mu = y.mean()
    z = y - mu
    if q == 0:
        if p == 0:
            return mu, np.array([]), np.array([]), np.zeros(n)
        X = np.column_stack([z[p - i - 1 : n - i - 1] for i in range(p)])
        beta, *_ = np.linalg.lstsq(X, z[p:], rcond=None)
        resid = np.zeros(n)
        resid[p:] = z[p:] - X @ beta
        return mu, beta, np.array([]), resid
    # stage 1: long AR for innovation proxies
    m = min(max(2 * (p + q), 10), n // 2 - 1)
    Xl = np.column_stack([z[m - i - 1 : n - i - 1] for i in range(m)])
    phi_l, *_ = np.linalg.lstsq(Xl, z[m:], rcond=None)
    eps = np.zeros(n)
    eps[m:] = z[m:] - Xl @ phi_l
    # stage 2: OLS on p AR lags + q innovation lags
    s = max(p, q) + m
    rows = n - s
    cols = [z[s - i - 1 : n - i - 1] for i in range(p)] + [
        eps[s - j - 1 : n - j - 1] for j in range(q)
    ]
    X = np.column_stack([c[:rows] for c in cols]) if cols else np.empty((rows, 0))
    beta, *_ = np.linalg.lstsq(X, z[s:], rcond=None)
    phi, theta = beta[:p], beta[p:]
    resid = np.zeros(n)
    resid[s:] = z[s:] - X @ beta
    return mu, phi, theta, resid


def arima_fit_forecast(
    y: np.ndarray, h: int, order: tuple[int, int, int] = (1, 0, 0)
) -> tuple[np.ndarray, np.ndarray]:
    """(fitted, forecast) at the ORIGINAL level (reintegrated)."""
    p, d, q = order
    work = y.astype(float)
    heads = []
    for _ in range(d):
        heads.append(work.copy())
        work = np.diff(work)
    mu, phi, theta, resid = _hannan_rissanen(work, p, q)
    z = work - mu
    n = len(work)

    fitted_z = np.full(n, 0.0)
    start = max(p, q)
    for t in range(start, n):
        val = 0.0
        for i in range(p):
            val += phi[i] * z[t - i - 1]
        for j in range(q):
            val += theta[j] * resid[t - j - 1]
        fitted_z[t] = val
    fitted_work = fitted_z + mu
    fitted_work[:start] = work[:start]  # warm-up: echo actuals

    # recursive forecast in differenced space
    zbuf = list(z)
    ebuf = list(resid)
    fz = []
    for step in range(h):
        val = 0.0
        for i in range(p):
            val += phi[i] * (zbuf[-i - 1] if len(zbuf) > i else 0.0)
        for j in range(q):
            val += theta[j] * (ebuf[-j - 1] if len(ebuf) > j else 0.0)
        fz.append(val)
        zbuf.append(val)
        ebuf.append(0.0)  # future innovations have expectation 0
    fc_work = np.array(fz) + mu

    # reintegrate d times: cumulative sums seeded from each level's tail
    fitted = fitted_work
    fc = fc_work
    for lvl in reversed(heads):
        # fitted at this level: shift-align (fitted_diff + lag of actual level)
        fitted = np.concatenate([[lvl[0]], lvl[:-1] + fitted])
        fc = lvl[-1] + np.cumsum(fc)
    return fitted, fc


def arima_model(
    df: DataFrame, features=None, order: tuple[int, int, int] = (1, 0, 0), **_
) -> DataFrame:
    try:  # prefer exact MLE when the optional backend exists
        import statsmodels.api as sm  # noqa: F401

        def fn(y, h):
            model = sm.tsa.ARIMA(y, order=order).fit()
            return np.asarray(model.fittedvalues), np.asarray(model.forecast(h))

        return run_series_kernel(df, fn)
    except ImportError:
        pass
    return run_series_kernel(df, lambda y, h: arima_fit_forecast(y, h, order))


def auto_arima_orders(
    y: np.ndarray, max_p: int = 3, max_d: int = 1, max_q: int = 2
) -> tuple[int, int, int]:
    """Order search (reference auto_arima, auxmodels.py:6-45 via
    pmdarima): d first by unit-root testing — AIC is NOT comparable
    across differencing levels (different response variable), which is
    also why pmdarima separates the d decision — then AIC over (p,q)
    on the differenced series."""
    from scalecast_spark.functions.stattests import _adf_stat, _ADF_CRIT

    w = y.astype(float)
    d = 0
    while d < max_d:
        stat, _ = _adf_stat(w)
        if stat < _ADF_CRIT["5%"]:
            break
        w = np.diff(w)
        d += 1
    n = len(w)
    best_pq, best_aic = (1, 0), np.inf
    for p in range(max_p + 1):
        for q in range(max_q + 1):
            if p == 0 and q == 0:
                continue
            try:
                _, _, _, resid = _hannan_rissanen(w, p, q)
                s = max(p, q) + (0 if q == 0 else min(max(2 * (p + q), 10), n // 2 - 1))
                use = resid[s:]
                if len(use) < 5:
                    continue
                sigma2 = float(use @ use) / len(use)
                if sigma2 <= 0:
                    continue
                aic = len(use) * np.log(sigma2) + 2 * (p + q + 1)
                if aic < best_aic:
                    best_aic, best_pq = aic, (p, q)
            except np.linalg.LinAlgError:
                continue
    return (best_pq[0], d, best_pq[1])


def auto_arima_model(df: DataFrame, features=None, max_p: int = 3, max_d: int = 1, max_q: int = 2, **_) -> DataFrame:
    def fn(y, h):
        order = auto_arima_orders(y, max_p, max_d, max_q)
        return arima_fit_forecast(y, h, order)

    return run_series_kernel(df, fn)


def _fourier_cols(t: np.ndarray, period: float, order: int) -> list[np.ndarray]:
    cols = []
    for k in range(1, order + 1):
        w = 2.0 * np.pi * k * t / period
        cols.append(np.sin(w))
        cols.append(np.cos(w))
    return cols


def prophet_fit_forecast(
    y: np.ndarray, h: int, n_changepoints: int = 10,
    weekly_order: int = 3, yearly_order: int = 10, ridge: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """TF-free core of the prophet additive model (Taylor & Letham
    2017; the public model is g(t) + s(t) + e): piecewise-linear trend
    with changepoints at quantiles of the first 80% of history, Fourier
    seasonality (weekly order 3; yearly order 10 when the history spans
    >2 cycles), fit jointly by ridge-penalized least squares — the L2
    stand-in for prophet's MAP estimate with a Laplace changepoint
    prior. Daily spacing assumed, matching the engine's long frame."""
    n = len(y)
    t = np.arange(n, dtype=float)
    cps = np.quantile(t[: max(int(0.8 * n), 2)],
                      np.linspace(0.1, 0.9, n_changepoints)) if n > 10 else []
    cols = [np.ones(n), t]
    pen = [0.0, 0.0]
    for cp in cps:
        cols.append(np.maximum(t - cp, 0.0))
        pen.append(ridge)
    for c in _fourier_cols(t, 7.0, weekly_order):
        cols.append(c)
        pen.append(0.0)
    if n > 2 * 365:
        for c in _fourier_cols(t, 365.25, yearly_order):
            cols.append(c)
            pen.append(0.0)
    X = np.column_stack(cols)
    A = X.T @ X + np.diag(pen)
    beta = np.linalg.solve(A, X.T @ y)
    fitted = X @ beta

    tf = np.arange(n, n + h, dtype=float)
    fcols = [np.ones(h), tf]
    for cp in cps:
        fcols.append(np.maximum(tf - cp, 0.0))
    for c in _fourier_cols(tf, 7.0, weekly_order):
        fcols.append(c)
    if n > 2 * 365:
        for c in _fourier_cols(tf, 365.25, yearly_order):
            fcols.append(c)
    fc = np.column_stack(fcols) @ beta
    return fitted, fc


def prophet_model(df: DataFrame, features=None, **kwargs) -> DataFrame:
    """Reference 'prophet' (models.py:1275-1401). Uses the real prophet
    package when installed; otherwise the numpy additive-model core
    (prophet_fit_forecast) — same model family, deterministic fit."""
    try:  # pragma: no cover - env-dependent
        from prophet import Prophet  # noqa: F401
        import pandas as pd

        def fn_real(y, h):
            ds = pd.date_range("2000-01-01", periods=len(y), freq="D")
            m = Prophet()
            m.fit(pd.DataFrame({"ds": ds, "y": y}))
            fut = m.make_future_dataframe(periods=h, freq="D")
            out = m.predict(fut)["yhat"].to_numpy()
            return out[: len(y)], out[len(y):]

        return run_series_kernel(df, fn_real)
    except ImportError:
        pass
    return run_series_kernel(
        df, lambda y, h: prophet_fit_forecast(y, h, **kwargs)
    )


def tbats_fit_forecast(
    y: np.ndarray, h: int, m: int = 7, fourier_order: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """TF-free core of TBATS (De Livera, Hyndman & Snyder 2011:
    Trigonometric seasonality, Box-Cox, ARMA errors, Trend, Seasonal):
    Box-Cox at the profile-likelihood λ (positive series only), linear
    trend + trigonometric seasonal terms by OLS, AR(1) on the residuals
    for the error process, forecasts reintegrated through the inverse
    Box-Cox."""
    from scalecast_spark.operators.features import _boxcox_mle_lambda

    n = len(y)
    use_bc = bool(np.all(y > 0))
    if use_bc:
        lam = _boxcox_mle_lambda(y)
        z = (np.power(y, lam) - 1.0) / lam if abs(lam) > 1e-12 else np.log(y)
    else:
        lam, z = 1.0, y.astype(float)
    t = np.arange(n, dtype=float)
    X = np.column_stack([np.ones(n), t] + _fourier_cols(t, float(m), fourier_order))
    beta, *_ = np.linalg.lstsq(X, z, rcond=None)
    resid = z - X @ beta
    phi = 0.0
    if n > 3:
        num = float(resid[1:] @ resid[:-1])
        den = float(resid[:-1] @ resid[:-1])
        phi = num / den if den > 0 else 0.0
        phi = float(np.clip(phi, -0.98, 0.98))
    fitted_z = X @ beta
    fitted_z[1:] += phi * resid[:-1]

    tf = np.arange(n, n + h, dtype=float)
    Xf = np.column_stack([np.ones(h), tf] + _fourier_cols(tf, float(m), fourier_order))
    fc_z = Xf @ beta + phi ** np.arange(1, h + 1) * (resid[-1] if n else 0.0)

    def inv(v):
        if not use_bc:
            return v
        if abs(lam) > 1e-12:
            base = np.maximum(lam * v + 1.0, 1e-12)
            return np.power(base, 1.0 / lam)
        return np.exp(v)

    return inv(fitted_z), inv(fc_z)


def tbats_model(df: DataFrame, features=None, m: int = 7, **kwargs) -> DataFrame:
    """Reference 'tbats' (models.py:1061-1147). Real tbats package when
    installed; otherwise the numpy TBATS core (tbats_fit_forecast)."""
    try:  # pragma: no cover - env-dependent
        from tbats import TBATS  # noqa: F401

        def fn_real(y, h):
            est = TBATS(seasonal_periods=[m])
            model = est.fit(y)
            return model.y_hat, model.forecast(steps=h)

        return run_series_kernel(df, fn_real)
    except ImportError:
        pass
    return run_series_kernel(
        df, lambda y, h: tbats_fit_forecast(y, h, m=m, **kwargs)
    )
