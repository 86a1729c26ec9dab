"""Property-based tests for the round-10 components: invariants that
hold for ANY input, not just the fixtures — the fixed-structure forest
forward's affine equivariance and oracle agreement, the pointwise
transforms' algebraic identities, and the prophet/tbats cores'
shift/scale behavior."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from scalecast_spark.models.arima import (
    prophet_fit_forecast,
    tbats_fit_forecast,
)
from scalecast_spark.models.trees import make_fixed_forest_forward

_series_strat = st.lists(
    st.floats(min_value=-50, max_value=50,
              allow_nan=False, allow_infinity=False),
    min_size=12, max_size=40,
)


@settings(max_examples=25, deadline=None)
@given(ys=_series_strat,
       a=st.floats(min_value=0.5, max_value=20, allow_nan=False),
       b=st.floats(min_value=-100, max_value=100, allow_nan=False))
def test_forest_forward_affine_equivariant(ys, a, b):
    """The forest members standardize the window before routing and
    de-standardize after aggregating, so for any a>0, b:
    fc(a*y + b) == a*fc(y) + b — the trees see IDENTICAL standardized
    inputs, hence identical routes and leaf values."""
    y = np.asarray(ys, float)
    if y.std() < 1e-9:
        # degenerate/denormal sd: standardizing by a subnormal std is
        # catastrophic cancellation (hypothesis found ys of eleven 0.0s
        # + 1.17e-38, std ~3e-39, where (y+b - mean)/std routes trees on
        # rounding noise) — the property's precondition is a numerically
        # meaningful standardization, same spirit as the sd==0 guard
        return
    for kind in ("rf", "gbt", "cat"):
        fn = make_fixed_forest_forward(kind)
        _, fc = fn(y, 5)
        _, fc2 = fn(a * y + b, 5)
        assert np.allclose(fc2, a * fc + b, rtol=1e-9, atol=1e-6)


@settings(max_examples=15, deadline=None)
@given(ys=st.lists(
    st.floats(min_value=-1000, max_value=1000,
              allow_nan=False, allow_infinity=False),
    min_size=10, max_size=60,
))
def test_forest_forward_matches_sql_replay(ys, ):
    """For ANY series whose standardized window stays clear of every
    split threshold (ulp-robust routing), the engine forward equals
    the DuckDB CASE WHEN replay — the gate's property, off-fixture."""
    import __spark_entry__ as e
    from scalecast_spark.models.trees import (
        fixed_cart_spec,
        fixed_oblivious_spec,
    )

    y = np.asarray(ys, float)
    sd = y.std() or 1.0
    a = (y[-4:] - y.mean()) / sd
    thrs = set()
    for s in range(1, 8):
        for t in range(3):
            for salt in (0.0, 5.0):
                f_, th_, _ = fixed_cart_spec(s, t, salt=salt)
                thrs |= set(th_)
            thrs |= {thr for _, thr in fixed_oblivious_spec(s, t)[0]}
    if min(abs(v - thr) for v in a for thr in thrs) < 1e-9:
        return  # measure-zero routing tie: rounding margin not owed
    ser = pd.DataFrame({
        "series_id": "s",
        "ds": pd.date_range("2024-01-01", periods=len(y)).date,
        "y": y,
    })
    con = duckdb.connect()
    con.register("series_src", ser)
    odf = con.execute(f"""
        WITH series AS (SELECT * FROM series_src),
        steps AS (SELECT unnest(range(1, 8)) AS step),
        {e._networks_forward_ctes()},
        {e._forest_forward_ctes()}
        SELECT 'rf' AS kind, ds, forecast FROM ff_rf_fc
        UNION ALL SELECT 'gbt', ds, forecast FROM ff_gbt_fc
        UNION ALL SELECT 'cat', ds, forecast FROM ff_cat_fc
    """).df()
    for kind in ("rf", "gbt", "cat"):
        _, fc = make_fixed_forest_forward(kind)(y, 7)
        o = odf[odf["kind"] == kind].sort_values("ds")["forecast"]
        scale = max(1.0, np.abs(fc).max())
        assert np.abs(fc - o.to_numpy()).max() / scale < 1e-9


@settings(max_examples=40, deadline=None)
@given(y=st.floats(min_value=1e-6, max_value=1e6, allow_nan=False))
def test_pointwise_transform_inverses(y):
    """Log/Sqrt/BoxCox expr∘inv_expr == identity on scalars across the
    positive axis (the gate certifies the forward; this pins the
    inverse algebra — replicated in numpy from the class formulas,
    since the Column expressions need a session — for any magnitude,
    including lambdas the fixture never uses)."""
    for lm in (0.5, -0.3, 2.0):
        z = (np.power(y, lm) - 1.0) / lm
        back = np.power(z * lm + 1.0, 1.0 / lm)
        assert np.isclose(back, y, rtol=1e-9)
    assert np.isclose(np.exp(np.log(y)), y, rtol=1e-12)
    assert np.isclose(np.sqrt(y) ** 2, y, rtol=1e-12)


@settings(max_examples=20, deadline=None)
@given(ys=_series_strat,
       b=st.floats(min_value=-100, max_value=100, allow_nan=False))
def test_prophet_shift_equivariant(ys, b):
    """Adding a constant shifts prophet forecasts by that constant:
    the intercept column is unpenalized, so the ridge solution moves
    it exactly (trend/seasonal/changepoint coefficients unchanged)."""
    y = np.asarray(ys, float)
    _, fc = prophet_fit_forecast(y, 5)
    _, fc2 = prophet_fit_forecast(y + b, 5)
    assert np.allclose(fc2, fc + b, rtol=1e-7, atol=1e-6)


@settings(max_examples=20, deadline=None)
@given(ys=st.lists(
    st.floats(min_value=-200, max_value=-1,
              allow_nan=False, allow_infinity=False),
    min_size=12, max_size=40,
), a=st.floats(min_value=0.5, max_value=5, allow_nan=False))
def test_tbats_scale_equivariant_without_boxcox(ys, a):
    """With the Box-Cox branch off (all-negative series), tbats is a
    linear pipeline (OLS + AR(1) on residuals), so scaling the input
    scales fitted and forecasts: fc(a*y) == a*fc(y). The AR(1)
    estimator is scale-invariant (ratio of quadratics)."""
    y = np.asarray(ys, float)
    fit1, fc1 = tbats_fit_forecast(y, 5)
    fit2, fc2 = tbats_fit_forecast(a * y, 5)
    assert np.allclose(fc2, a * fc1, rtol=1e-6, atol=1e-6)
    assert np.allclose(fit2, a * fit1, rtol=1e-6, atol=1e-6, equal_nan=True)
