"""Import-compatibility with the reference's ``scalecast.util``
(reference src/scalecast/util.py): ported ``from scalecast.util import
...`` lines work with the module name swapped. Everything here is a
re-export of (or a thin adapter over) the engine's real homes — the
docstring of each target carries the Spark-first design notes.
"""

from __future__ import annotations

import numpy as np

from scalecast_spark.forecaster import (  # noqa: F401
    break_mv_forecaster,
)
from scalecast_spark.functions.seasonal import (  # noqa: F401
    find_seasonal_length,
)
from scalecast_spark.functions.intervals import (  # noqa: F401
    apply_stepwise_intervals,
    backtest_resid_steps,
    stepwise_widths,
    transfer_cis,
)
from scalecast_spark.grids import gen_rnn_grid  # noqa: F401
from scalecast_spark.operators.impute import (  # noqa: F401
    Forecaster_with_missing_vals,
)
from scalecast_spark.pipeline import backtest_metrics  # noqa: F401
from scalecast_spark.transform_search import (  # noqa: F401
    find_optimal_transformation,
    find_statistical_transformation,
)

#: reference util.py:1157-1270 names for the step-wise interval flow —
#: the engine's residual "matrix" is a long DataFrame, not a numpy
#: matrix, so the three reference stages map onto the two real ones
backtest_for_resid_matrix = backtest_resid_steps
get_backtest_resid_matrix = backtest_resid_steps
overwrite_forecast_intervals = apply_stepwise_intervals


class metrics:
    """Array-level metric statics (reference util.metrics — the
    two-argument functions users hand to ``set_metrics`` /
    ``MetricStore``). The ENGINE evaluates metrics as distributed
    SQL aggregates (functions/metrics.py); these numpy twins exist
    for ported driver-side code and custom-metric callables, which
    by contract receive small arrays."""

    @staticmethod
    def bias(a, f):
        a, f = np.asarray(a, float), np.asarray(f, float)
        return float(np.sum(f - a))

    @staticmethod
    def abias(a, f):
        return abs(metrics.bias(a, f))

    @staticmethod
    def mse(a, f):
        a, f = np.asarray(a, float), np.asarray(f, float)
        return float(np.mean((a - f) ** 2))

    @staticmethod
    def rmse(a, f):
        return float(np.sqrt(metrics.mse(a, f)))

    @staticmethod
    def mae(a, f):
        a, f = np.asarray(a, float), np.asarray(f, float)
        return float(np.mean(np.abs(a - f)))

    @staticmethod
    def mape(a, f):
        # reference Metrics.py:69-72: NaN (not inf) when ANY actual
        # is zero — matches the distributed functions/metrics.py rule
        a, f = np.asarray(a, float), np.asarray(f, float)
        if np.abs(a).min() == 0:
            return float("nan")
        return float(np.mean(np.abs((a - f) / a)))

    @staticmethod
    def smape(a, f):
        a, f = np.asarray(a, float), np.asarray(f, float)
        return float(
            np.mean(np.abs(a - f) / ((np.abs(a) + np.abs(f)) / 2))
        )

    @staticmethod
    def r2(a, f):
        # reference Metrics.py:101 delegates to sklearn.r2_score,
        # whose degenerate rule for zero-variance actuals is 1.0 on a
        # perfect fit and 0.0 otherwise — replicated exactly
        a, f = np.asarray(a, float), np.asarray(f, float)
        ss_res = float(np.sum((a - f) ** 2))
        ss_tot = float(np.sum((a - np.mean(a)) ** 2))
        if ss_tot == 0.0:
            return 1.0 if ss_res == 0.0 else 0.0
        return 1.0 - ss_res / ss_tot

    @staticmethod
    def mase(a, f, obs, m=1):
        a, f = np.asarray(a, float), np.asarray(f, float)
        obs = np.asarray(obs, float)
        denom = float(np.mean(np.abs(obs[m:] - obs[:-m])))
        return float(np.mean(np.abs(a - f))) / denom if denom else float("nan")


def find_optimal_lag_order(mvf, train_only: bool = False, maxlags: int = 5, **_):
    """reference util.py:298-341 (statsmodels VAR select_order) — the
    engine's distributed twin lives in functions/var_select.py; this
    adapter accepts the reference's Forecaster-object call shape."""
    from scalecast_spark.functions.var_select import (
        find_optimal_lag_order as _flo,
    )

    df = mvf.tsf.observed if hasattr(mvf, "tsf") else mvf
    if train_only and getattr(mvf, "test_length", 0):
        df = mvf._stat_frame(train_only=True)
    return _flo(df, maxlags=maxlags)


def find_optimal_coint_rank(
    mvf, det_order: int = -1, k_ar_diff: int = 1, train_only: bool = False, **_
):
    """reference util.py:390-429 (Johansen) — engine twin in
    models/vecm.py; same Forecaster-object adapter as above."""
    from scalecast_spark.models.vecm import (
        find_optimal_coint_rank as _fcr,
    )

    df = mvf.tsf.observed if hasattr(mvf, "tsf") else mvf
    if train_only and getattr(mvf, "test_length", 0):
        df = mvf._stat_frame(train_only=True)
    return _fcr(df, k_ar_diff=k_ar_diff)


def infer_apply_Xvar_selection(infer_from, apply_to, return_copy: bool = False):
    """Replay one object's feature recipe onto another (reference
    util.py:343-388). The reference REVERSE-ENGINEERS names out of
    current_xreg; the engine records every add_* call as a recipe
    (forecaster.export_recipe), so the transfer is exact — nothing to
    guess, nothing to warn about."""
    if return_copy:
        apply_to = apply_to.copy()
    return apply_to.apply_recipe(infer_from.export_recipe())
