"""Structural pins for the prophet / tbats numpy cores (round-10
extension of the boost-core treatment): analytic fixtures inside each
model family make the fit's structure and forecasts exactly known, so
core fidelity is certified package-free (the real prophet/tbats
packages are env-gated and absent here; reference wrappers
src/scalecast/models.py:1275-1401 and :1061-1147).

What each pin certifies:
- prophet (models/arima.py prophet_fit_forecast): the ridge objective
  is zero at the truth when the series lies in the unpenalized span
  (trend + weekly Fourier [+ exog]), so recovery must be EXACT —
  changepoint design, Fourier design, exog channel and the forecast
  extension all pinned analytically; a genuine slope break placed ON
  a quantile changepoint pins the piecewise-trend channel.
- tbats (tbats_fit_forecast): with negatives present the Box-Cox
  branch is off and the OLS trend+trig fit is exact on an in-family
  series (forecast = analytic continuation); an alternating residual
  orthogonal to the design pins the AR(1) estimator and its ±0.98
  clip; the Box-Cox λ grid search is pinned directly by inverting
  exact normal quantiles at known λ*. The λ>0 INTEGRATION path
  (transform → fit → inverse) is already value-hash-certified by the
  ts_prophet_tbats gate family on the positive fixture series.
"""

from statistics import NormalDist

import numpy as np

from scalecast_spark.models.arima import (
    prophet_fit_forecast,
    tbats_fit_forecast,
)
from scalecast_spark.operators.features import _boxcox_mle_lambda


def _weekly(t, a_sin, a_cos):
    w = 2.0 * np.pi * t / 7.0
    return a_sin * np.sin(w) + a_cos * np.cos(w)


# --- prophet ----------------------------------------------------------


def test_prophet_recovers_in_family_series_exactly():
    """Trend + weekly Fourier truth is reachable with zero residual
    and zero changepoint coefficients, so the ridge optimum IS the
    truth and the forecast is its analytic continuation."""
    n, h = 100, 14
    t = np.arange(n, dtype=float)
    truth = lambda tt: 50.0 + 0.8 * tt + _weekly(tt, 5.0, -3.0)  # noqa: E731
    fitted, fc = prophet_fit_forecast(truth(t), h)
    assert np.abs(fitted - truth(t)).max() < 1e-6
    tf = np.arange(n, n + h, dtype=float)
    assert np.abs(fc - truth(tf)).max() < 1e-6


def test_prophet_changepoint_recovers_slope_break():
    """A kink placed exactly on a quantile changepoint (t*=39.5 for
    n=100: quantile 0.5 of t[:80]) is representable by one hinge; the
    L2 penalty shrinks the hinge coefficient only marginally (penalty
    1 vs a ~1e4 column norm), so the forecast must continue the
    POST-break slope within 1%."""
    n, h = 100, 20
    t = np.arange(n, dtype=float)
    cp, d_slope = 39.5, 2.0
    y = 10.0 + 0.5 * t + d_slope * np.maximum(t - cp, 0.0)
    _, fc = prophet_fit_forecast(y, h)
    slope = np.polyfit(np.arange(h), fc, 1)[0]
    assert abs(slope - (0.5 + d_slope)) / (0.5 + d_slope) < 0.01
    tf = np.arange(n, n + h, dtype=float)
    want = 10.0 + 0.5 * tf + d_slope * (tf - cp)
    assert np.abs(fc - want).max() / np.abs(want).max() < 0.01


def test_prophet_exog_channel_exact():
    """add_regressor twin: a known covariate effect enters the same
    design unpenalized, so it is recovered exactly and applied to the
    FUTURE covariate values."""
    n, h = 80, 7
    rng = np.random.RandomState(0)
    t = np.arange(n, dtype=float)
    x_all = rng.rand(n + h)
    beta_x = 12.0
    y = 20.0 + 0.3 * t + _weekly(t, 2.0, 1.0) + beta_x * x_all[:n]
    fitted, fc = prophet_fit_forecast(
        y, h, X=x_all[:n, None], Xf=x_all[n:, None]
    )
    tf = np.arange(n, n + h, dtype=float)
    want = 20.0 + 0.3 * tf + _weekly(tf, 2.0, 1.0) + beta_x * x_all[n:]
    assert np.abs(fitted - y).max() < 1e-6
    assert np.abs(fc - want).max() < 1e-6


# --- tbats ------------------------------------------------------------


def test_tbats_recovers_trend_trig_exactly():
    """Negatives force the Box-Cox branch off; an in-family series
    (linear trend + period-7 trig orders 1..3) is fit exactly by the
    OLS design, and the forecast is its analytic continuation. The
    degenerate-residual AR(1) term is clipped and scaled by ~1e-10
    residuals, so it cannot perturb the 1e-6 tolerance."""
    n, h = 84, 14
    t = np.arange(n, dtype=float)

    def truth(tt):
        out = -30.0 + 1.1 * tt  # crosses zero: use_bc stays False
        for k, (a, b) in enumerate([(4.0, -2.0), (1.5, 0.5), (0.7, 0.2)],
                                   start=1):
            w = 2.0 * np.pi * k * tt / 7.0
            out = out + a * np.sin(w) + b * np.cos(w)
        return out

    fitted, fc = tbats_fit_forecast(truth(t), h, m=7, fourier_order=3)
    # fitted[0] carries no AR correction; later rows add phi*resid,
    # resid ~ 1e-10
    assert np.abs(fitted - truth(t)).max() < 1e-6
    tf = np.arange(n, n + h, dtype=float)
    assert np.abs(fc - truth(tf)).max() < 1e-6


def test_tbats_ar1_channel_and_clip():
    """An alternating ±eps component is (near-)unabsorbable by
    [1, t, trig(7)]: the OLS residual keeps lag-1 autocorrelation
    < -0.98, so the estimator must CLIP phi to exactly -0.98, and the
    forecast must equal design-continuation + (-0.98)^k · resid_n to
    float precision (the design part replicated here with the
    production _fourier_cols, so only the AR channel is under test)."""
    from scalecast_spark.models.arima import _fourier_cols

    n, h = 84, 6
    t = np.arange(n, dtype=float)
    eps = 5.0
    y = -10.0 + 0.2 * t + eps * ((-1.0) ** t)  # negatives: Box-Cox off
    X = np.column_stack([np.ones(n), t] + _fourier_cols(t, 7.0, 3))
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    raw_phi = float(resid[1:] @ resid[:-1]) / float(resid[:-1] @ resid[:-1])
    assert raw_phi < -0.98  # the clip must engage
    tf = np.arange(n, n + h, dtype=float)
    Xf = np.column_stack([np.ones(h), tf] + _fourier_cols(tf, 7.0, 3))
    want = Xf @ beta + (-0.98) ** np.arange(1, h + 1) * resid[-1]
    _, fc = tbats_fit_forecast(y, h, m=7, fourier_order=3)
    assert np.abs(fc - want).max() < 1e-9


def test_boxcox_lambda_grid_recovers_known_lambda():
    """Direct pin of the λ profile search: invert exact standard
    normal quantiles through Box-Cox at known λ*, and the grid MLE
    must hand λ* back (the transformed data is exactly the normal
    score grid, the likelihood's optimum)."""
    nd = NormalDist()
    z = np.array([nd.inv_cdf((i + 0.5) / 400) for i in range(400)])
    for lam_star in (0.0, 0.5, 1.0):
        zz = 0.25 * z + 3.0  # keep inv-boxcox arguments positive
        if lam_star == 0.0:
            x = np.exp(zz)
        else:
            x = np.power(lam_star * zz + 1.0, 1.0 / lam_star)
        assert (x > 0).all()
        lam_hat = _boxcox_mle_lambda(x)
        assert abs(lam_hat - lam_star) < 0.051, (lam_star, lam_hat)


def test_cores_are_deterministic():
    """Same input, same output — both cores are closed-form (no RNG),
    the property the gate's hash stability rests on."""
    y = 40.0 + np.sin(np.arange(60) * 0.4) * 7 + np.arange(60) * 0.3
    for fn in (
        lambda: prophet_fit_forecast(y, 7),
        lambda: tbats_fit_forecast(y, 7),
    ):
        f1, c1 = fn()
        f2, c2 = fn()
        assert np.array_equal(f1, f2, equal_nan=True)
        assert np.array_equal(c1, c2)
