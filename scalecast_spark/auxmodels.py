"""Import-compatibility with the reference's ``scalecast.auxmodels``
(reference src/scalecast/auxmodels.py): ``auto_arima`` and
``mlp_stack`` as module-level helpers that mutate a Forecaster, plus
the vecm re-export. The real engines live in models/arima.py (grid
order search inside the series kernel), selection.py (stacked
generalization), and models/vecm.py."""

from __future__ import annotations

from scalecast_spark.models.vecm import vecm_model as vecm  # noqa: F401
from scalecast_spark.selection import mlp_stack  # noqa: F401


def auto_arima(f, call_me: str = "auto_arima", m: int | str = 1, **kwargs):
    """Fit the best-AIC ARIMA order and bank it under ``call_me``
    (reference auxmodels.py:6-45 wraps pmdarima.auto_arima; the
    engine's order search is models/arima.auto_arima_orders — a
    stepwise AIC walk inside the distributed series kernel)."""
    prev = f.estimator
    f.set_estimator("auto_arima")
    f.manual_forecast(call_me=call_me, m=m, **kwargs)
    if prev:
        f.set_estimator(prev)
    return f
