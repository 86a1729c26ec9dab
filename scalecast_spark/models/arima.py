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


def prophet_model(df: DataFrame, features=None, **_) -> DataFrame:
    """Reference 'prophet' (models.py:1275-1401). Needs the prophet
    package; import-gated."""
    try:
        import prophet  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "prophet not installed; 'theta' or 'hwes' cover trend+"
            "seasonality without extra deps"
        ) from e
    raise NotImplementedError("prophet backend wiring lands when installed")


def tbats_model(df: DataFrame, features=None, **_) -> DataFrame:
    """Reference 'tbats' (models.py:1061-1147). Needs tbats; gated."""
    try:
        import tbats  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError("tbats not installed") from e
    raise NotImplementedError("tbats backend wiring lands when installed")
