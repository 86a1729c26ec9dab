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


def _hr_lags(p: int, q: int, P: int = 0, Q: int = 0, m: int = 0):
    """AR / MA lag sets for a (p,q)×(P,Q)_m model under the ADDITIVE
    seasonal approximation: seasonal polynomials contribute pure lags
    {m, 2m, ...} without the multiplicative cross terms (φΦ at lag
    m+1 etc.) — the standard Hannan-Rissanen simplification; exact
    multiplicative MLE is the statsmodels upgrade path."""
    ar = list(dict.fromkeys(
        list(range(1, p + 1)) + [m * i for i in range(1, P + 1) if m > 0]
    ))
    ma = list(dict.fromkeys(
        list(range(1, q + 1)) + [m * j for j in range(1, Q + 1) if m > 0]
    ))
    return ar, ma


def _hannan_rissanen(
    y: np.ndarray, p: int, q: int, P: int = 0, Q: int = 0, m: int = 0
):
    """Returns (mu, ar, ma, resid) where ar/ma are [(lag, coef), ...].
    With P=Q=0 this is numerically identical to the plain (p,q) fit."""
    n = len(y)
    mu = y.mean()
    z = y - mu
    ar_lags, ma_lags = _hr_lags(p, q, P, Q, m)
    if not ma_lags:
        if not ar_lags:
            return mu, [], [], np.zeros(n)
        s = max(ar_lags)
        X = np.column_stack([z[s - l : n - l] for l in ar_lags])
        beta, *_ = np.linalg.lstsq(X, z[s:], rcond=None)
        resid = np.zeros(n)
        resid[s:] = z[s:] - X @ beta
        return mu, list(zip(ar_lags, beta)), [], resid
    # stage 1: long AR for innovation proxies (long enough to cover the
    # seasonal lags)
    n_ar = p + q + (P + Q) * m
    ml = min(max(2 * n_ar, 10), n // 2 - 1)
    if ml < 1:
        raise ValueError(
            f"series too short ({n}) for the MA long-AR stage "
            f"(needs at least 4 observations)"
        )
    Xl = np.column_stack([z[ml - i - 1 : n - i - 1] for i in range(ml)])
    phi_l, *_ = np.linalg.lstsq(Xl, z[ml:], rcond=None)
    eps = np.zeros(n)
    eps[ml:] = z[ml:] - Xl @ phi_l
    # stage 2: OLS on the AR lags + innovation-proxy lags
    s = max(ar_lags + ma_lags) + ml
    rows = n - s
    if rows < len(ar_lags) + len(ma_lags) + 1:
        raise ValueError(
            f"series too short ({n}) for seasonal order with lags "
            f"{ar_lags + ma_lags} after a length-{ml} long-AR stage"
        )
    cols = [z[s - l : n - l] for l in ar_lags] + [
        eps[s - l : n - l] for l in ma_lags
    ]
    X = np.column_stack([c[:rows] for c in cols]) if cols else np.empty((rows, 0))
    beta, *_ = np.linalg.lstsq(X, z[s:], rcond=None)
    ar = list(zip(ar_lags, beta[: len(ar_lags)]))
    ma = list(zip(ma_lags, beta[len(ar_lags):]))
    resid = np.zeros(n)
    resid[s:] = z[s:] - X @ beta
    return mu, ar, ma, resid


def arima_fit_forecast(
    y: np.ndarray,
    h: int,
    order: tuple[int, int, int] = (1, 0, 0),
    seasonal_order: tuple[int, int, int, int] = (0, 0, 0, 0),
    X: np.ndarray | None = None,
    Xf: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(fitted, forecast) at the ORIGINAL level (reintegrated).

    ``seasonal_order=(P,D,Q,m)`` mirrors the reference's statsmodels
    pass-through (models.py:1150-1273): D seasonal differences at
    period m, then seasonal AR/MA at lags {m..Pm}/{m..Qm} via the same
    Hannan-Rissanen regression (additive approximation — see _hr_lags).

    ``X``/``Xf`` (n×k observed / h×k future exog) use regression with
    ARIMA errors: OLS of y on [1, X] at the ORIGINAL level, then the
    full (S)ARIMA machinery on the OLS residuals; forecast = exog
    projection + error-process forecast. statsmodels SARIMAX estimates
    the regression jointly in the state-space filter — coefficient
    differences are second-order for well-conditioned exog.
    """
    p, d, q = order
    P, D, Q, m = seasonal_order
    work = y.astype(float)

    reg_fit = np.zeros(len(work))
    reg_fc = np.zeros(h)
    if X is not None and np.size(X):
        X = np.asarray(X, float).reshape(len(work), -1)
        Xd = np.column_stack([np.ones(len(work)), X])
        bx, *_ = np.linalg.lstsq(Xd, work, rcond=None)
        reg_fit = Xd @ bx
        work = work - reg_fit
        if h:
            if Xf is None or np.shape(np.asarray(Xf, float).reshape(h, -1))[0] != h:
                raise ValueError(
                    "exog ARIMA needs future exog rows (Xf) matching h"
                )
            reg_fc = np.column_stack(
                [np.ones(h), np.asarray(Xf, float).reshape(h, -1)]
            ) @ bx

    heads = []
    for _ in range(d):
        heads.append(work.copy())
        work = np.diff(work)
    sheads = []
    for _ in range(D):
        if m <= 0 or len(work) <= m:
            raise ValueError(
                f"cannot seasonally difference length-{len(work)} series "
                f"at period {m}"
            )
        sheads.append(work.copy())
        work = work[m:] - work[:-m]
    mu, ar, ma, resid = _hannan_rissanen(work, p, q, P, Q, m)
    z = work - mu
    n = len(work)

    fitted_z = np.full(n, 0.0)
    start = max([l for l, _ in ar + ma], default=0)
    for t in range(start, n):
        val = 0.0
        for lag, coef in ar:
            val += coef * z[t - lag]
        for lag, coef in ma:
            val += coef * resid[t - lag]
        fitted_z[t] = val
    fitted_work = fitted_z + mu
    fitted_work[:start] = work[:start]  # warm-up: echo actuals

    # recursive forecast in (seasonally-)differenced space
    zbuf = list(z)
    ebuf = list(resid)
    fz = []
    for _step in range(h):
        val = 0.0
        for lag, coef in ar:
            val += coef * (zbuf[-lag] if len(zbuf) >= lag else 0.0)
        for lag, coef in ma:
            val += coef * (ebuf[-lag] if len(ebuf) >= lag else 0.0)
        fz.append(val)
        zbuf.append(val)
        ebuf.append(0.0)  # future innovations have expectation 0
    fc_work = np.array(fz) + mu

    fitted = fitted_work
    fc = fc_work
    # undo seasonal differences first (they were applied last):
    # level[t] = lvl[t-m] + diff[t-m]; forecasts chain through their
    # own prior values once the horizon passes m
    for lvl in reversed(sheads):
        fitted = np.concatenate([lvl[:m], lvl[:-m] + fitted])
        ext = list(lvl)
        fc_lvl = []
        for step in range(h):
            val = ext[-m] + fc[step]
            fc_lvl.append(val)
            ext.append(val)
        fc = np.array(fc_lvl)
    # then the d regular differences: cumulative sums seeded from each
    # level's tail
    for lvl in reversed(heads):
        # fitted at this level: shift-align (fitted_diff + lag of actual level)
        fitted = np.concatenate([[lvl[0]], lvl[:-1] + fitted])
        fc = lvl[-1] + np.cumsum(fc)
    return fitted + reg_fit, fc + reg_fc


def arima_model(
    df: DataFrame,
    features=None,
    order: tuple[int, int, int] = (1, 0, 0),
    seasonal_order: tuple[int, int, int, int] = (0, 0, 0, 0),
    **_,
) -> DataFrame:
    """Reference 'arima' (models.py:1150-1273): order, seasonal_order,
    and Xvars→exog all supported. ``features`` (engine Xvar column
    names) become exog regressors; their future rows supply the
    forecast-time regressor values."""
    feats = list(features or [])
    try:  # prefer exact MLE when the optional backend exists
        import statsmodels.api as sm  # noqa: F401

        def fn(y, h, X=None, Xf=None):
            model = sm.tsa.ARIMA(
                y, exog=X, order=order, seasonal_order=seasonal_order
            ).fit()
            fc = model.forecast(h, exog=Xf) if h else np.empty(0)
            return np.asarray(model.fittedvalues), np.asarray(fc)

        return run_series_kernel(df, fn, feature_cols=feats or None)
    except ImportError:
        pass
    return run_series_kernel(
        df,
        lambda y, h, X=None, Xf=None: arima_fit_forecast(
            y, h, order, seasonal_order, X=X, Xf=Xf
        ),
        feature_cols=feats or None,
    )


def _seasonal_strength(y: np.ndarray, m: int) -> float:
    """Hyndman & Athanasopoulos (FPP) seasonal-strength statistic over
    a centered-MA + seasonal-means decomposition:
    F_s = max(0, 1 - var(remainder)/var(detrended)). pmdarima's nsdiffs
    uses OCSB; this published heuristic (threshold 0.64, the same one
    forecast::stlf/statsforecast use) needs no regression tables."""
    n = len(y)
    if m <= 1 or n < 3 * m:
        return 0.0
    if m % 2 == 0:
        w = np.r_[0.5, np.ones(m - 1), 0.5] / m
        k = m // 2
    else:
        w = np.ones(m) / m
        k = (m - 1) // 2
    trend = np.convolve(y, w, mode="valid")
    detr = y[k : n - k] - trend
    idx = np.arange(k, n - k) % m
    seas = np.array([detr[idx == j].mean() for j in range(m)])
    rem = detr - seas[idx]
    denom = float(np.var(detr))
    if denom <= 0:
        return 0.0
    return max(0.0, 1.0 - float(np.var(rem)) / denom)


def auto_arima_orders(
    y: np.ndarray, max_p: int = 3, max_d: int = 1, max_q: int = 2,
    m: int = 1, max_P: int = 1, max_Q: int = 1,
):
    """Order search (reference auto_arima, auxmodels.py:6-45 via
    pmdarima): differencing decisions first — AIC is NOT comparable
    across differencing levels (different response variable), which is
    also why pmdarima separates them — then AIC over the AR/MA grid on
    the differenced series.

    With ``m=1`` (default) returns the plain ``(p, d, q)`` tuple.
    With ``m>1`` the pmdarima recipe extends seasonally: D∈{0,1} by the
    FPP seasonal-strength heuristic (pmdarima: OCSB), d by ADF on the
    seasonally-adjusted series, then AIC over (p, q, P, Q) with the
    seasonal Hannan-Rissanen fit — returns
    ``((p, d, q), (P, D, Q, m))``.
    """
    from scalecast_spark.functions.stattests import _adf_stat, _ADF_CRIT

    w = y.astype(float)
    D = 0
    if m > 1 and _seasonal_strength(w, m) >= 0.64:
        w = w[m:] - w[:-m]
        D = 1
    d = 0
    while d < max_d:
        stat, _ = _adf_stat(w)
        if stat < _ADF_CRIT["5%"]:
            break
        w = np.diff(w)
        d += 1
    n = len(w)
    Ps = range(max_P + 1) if m > 1 else (0,)
    Qs = range(max_Q + 1) if m > 1 else (0,)
    best, best_aic = (1, 0, 0, 0), np.inf
    for p in range(max_p + 1):
        for q in range(max_q + 1):
            for P in Ps:
                for Q in Qs:
                    k = p + q + P + Q
                    if k == 0:
                        continue
                    try:
                        _, _, _, resid = _hannan_rissanen(w, p, q, P, Q, m)
                        ar_lags, ma_lags = _hr_lags(p, q, P, Q, m)
                        ml = (
                            0 if not ma_lags
                            else min(max(2 * (p + q + (P + Q) * m), 10), n // 2 - 1)
                        )
                        s = max(ar_lags + ma_lags, default=0) + ml
                        use = resid[s:]
                        if len(use) < 5:
                            continue
                        sigma2 = float(use @ use) / len(use)
                        if sigma2 <= 0:
                            continue
                        aic = len(use) * np.log(sigma2) + 2 * (k + 1)
                        if aic < best_aic:
                            best_aic, best = aic, (p, q, P, Q)
                    except (np.linalg.LinAlgError, ValueError):
                        continue
    p, q, P, Q = best
    if m > 1:
        return (p, d, q), (P, D, Q, m)
    return (p, d, q)


def auto_arima_model(df: DataFrame, features=None, max_p: int = 3, max_d: int = 1, max_q: int = 2,
                     m: int = 1, max_P: int = 1, max_Q: int = 1, **_) -> DataFrame:
    def fn(y, h):
        if m > 1:
            order, seasonal = auto_arima_orders(
                y, max_p, max_d, max_q, m=m, max_P=max_P, max_Q=max_Q
            )
            return arima_fit_forecast(y, h, order, seasonal)
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
    X: np.ndarray | None = None, Xf: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """TF-free core of the prophet additive model (Taylor & Letham
    2017; the public model is g(t) + s(t) + beta'x(t) + e):
    piecewise-linear trend with changepoints at quantiles of the first
    80% of history, Fourier seasonality (weekly order 3; yearly order
    10 when the history spans >2 cycles), and optional extra regressors
    ``X``/``Xf`` (prophet's ``add_regressor``: the covariates enter the
    same linear design, unpenalized), fit jointly by ridge-penalized
    least squares — the L2 stand-in for prophet's MAP estimate with a
    Laplace changepoint prior. Daily spacing assumed, matching the
    engine's long frame."""
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
    if X is not None and X.size:
        if h and (Xf is None or len(Xf) != h):
            raise ValueError("prophet with regressors needs future rows (Xf)")
        for j in range(X.shape[1]):
            cols.append(X[:, j].astype(float))
            pen.append(0.0)
    Xd = np.column_stack(cols)
    A = Xd.T @ Xd + np.diag(pen)
    beta = np.linalg.solve(A, Xd.T @ y)
    fitted = Xd @ beta

    tf = np.arange(n, n + h, dtype=float)
    fcols = [np.ones(h), tf]
    for cp in cps:
        fcols.append(np.maximum(tf - cp, 0.0))
    for c in _fourier_cols(tf, 7.0, weekly_order):
        fcols.append(c)
    if n > 2 * 365:
        for c in _fourier_cols(tf, 365.25, yearly_order):
            fcols.append(c)
    if X is not None and X.size and h:
        for j in range(Xf.shape[1]):
            fcols.append(Xf[:, j].astype(float))
    elif X is not None and X.size:  # h == 0: empty future exog columns
        for _ in range(X.shape[1]):
            fcols.append(np.zeros(0))
    fc = np.column_stack(fcols) @ beta
    return fitted, fc


def prophet_model(df: DataFrame, features=None, **kwargs) -> DataFrame:
    """Reference 'prophet' (models.py:1275-1401). Uses the real prophet
    package when installed; otherwise the numpy additive-model core
    (prophet_fit_forecast) — same model family, deterministic fit."""
    feats = list(features or [])
    try:  # pragma: no cover - env-dependent
        from prophet import Prophet  # noqa: F401
        import pandas as pd

        def fn_real(y, h, X=None, Xf=None):
            ds = pd.date_range("2000-01-01", periods=len(y), freq="D")
            m = Prophet()
            frame = pd.DataFrame({"ds": ds, "y": y})
            if X is not None and X.size:  # reference Xvars -> add_regressor
                for j, name in enumerate(feats):
                    m.add_regressor(name)
                    frame[name] = X[:, j]
            m.fit(frame)
            fut = m.make_future_dataframe(periods=h, freq="D")
            if X is not None and X.size:
                for j, name in enumerate(feats):
                    fut[name] = np.concatenate([X[:, j], Xf[:, j]])
            out = m.predict(fut)["yhat"].to_numpy()
            return out[: len(y)], out[len(y):]

        return run_series_kernel(df, fn_real, feature_cols=feats or None)
    except ImportError:
        pass
    return run_series_kernel(
        df,
        lambda y, h, X=None, Xf=None: prophet_fit_forecast(
            y, h, X=X, Xf=Xf, **kwargs
        ),
        feature_cols=feats or None,
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


def tbats_model(df: DataFrame, features=None, m: int | str = 7, **kwargs) -> DataFrame:
    """Reference 'tbats' (models.py:1061-1147). Real tbats package when
    installed; otherwise the numpy TBATS core (tbats_fit_forecast).
    ``m='auto'`` resolves the season length from the frame's inferred
    frequency (functions/seasonal.py)."""
    if m == "auto":
        from scalecast_spark.functions.seasonal import resolve_m

        m = resolve_m(m, df)
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
