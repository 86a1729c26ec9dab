"""VAR lag-order selection (reference find_optimal_lag_order,
util.py:298-341, via statsmodels VAR.select_order) in numpy: fit
VAR(p) by per-equation OLS over the wide series matrix for p = 1..maxlags,
report AIC/BIC; series count is small (the reference's MV ceiling), so
the matrix collects to the driver like the reference does."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from scalecast_spark.frame import DS, SERIES, Y


def find_optimal_lag_order(df: DataFrame, maxlags: int = 5) -> dict:
    """Returns {'aic': best_p, 'bic': best_p, 'scores': {p: (aic, bic)}}."""
    wide = (
        df.groupBy(DS).pivot(SERIES).agg(F.first(Y)).orderBy(DS).toPandas()
    )
    Ymat = wide.drop(columns=[DS]).to_numpy(float)
    n, k = Ymat.shape
    scores: dict[int, tuple[float, float]] = {}
    for p in range(1, maxlags + 1):
        rows = n - p
        X = np.column_stack(
            [np.ones(rows)]
            + [Ymat[p - i - 1 : n - i - 1] for i in range(p)]
        )
        T = Ymat[p:]
        beta, *_ = np.linalg.lstsq(X, T, rcond=None)
        resid = T - X @ beta
        sigma = resid.T @ resid / rows
        sign, logdet = np.linalg.slogdet(sigma)
        if sign <= 0:
            continue
        n_params = k * (k * p + 1)
        aic = logdet + 2.0 * n_params / rows
        bic = logdet + np.log(rows) * n_params / rows
        scores[p] = (float(aic), float(bic))
    best_aic = min(scores, key=lambda p: scores[p][0])
    best_bic = min(scores, key=lambda p: scores[p][1])
    return {"aic": best_aic, "bic": best_bic, "scores": scores}
