"""VECM — vector error-correction model with Johansen cointegration
(reference 'vecm' wrapper models.py:422-559 and find_optimal_coint_rank
util.py:390-428, both over statsmodels; implemented here from the
public Johansen (1991) reduced-rank regression procedure).

The MV series matrix is driver-sized by construction (the reference's
MVForecaster holds a handful of series), so like the reference we
collect the wide matrix and fit in numpy; the long-format results
rejoin the frame. Trace-test critical values are the standard
Osterwald-Lenum (1992) 5% table (intercept, no trend case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.frame import DS, SERIES, Y

#: Osterwald-Lenum 5% trace critical values, m = n_series - rank
_TRACE_CRIT_5 = {1: 3.76, 2: 15.41, 3: 29.68, 4: 47.21, 5: 68.52, 6: 94.15}


def _wide(df: DataFrame) -> pd.DataFrame:
    return (
        df.groupBy(DS).pivot(SERIES).agg(F.first(Y)).orderBy(DS).toPandas()
    )


def _johansen(Ymat: np.ndarray, k_ar_diff: int = 1):
    """Reduced-rank regression: returns (eigenvalues, eigenvectors beta,
    residual machinery) for the VECM ΔY_t = Π Y_{t-1} + Γ ΔY_{t-i} + c."""
    T, n = Ymat.shape
    dY = np.diff(Ymat, axis=0)
    k = k_ar_diff
    rows = len(dY) - k
    Z = [np.ones((rows, 1))]
    for i in range(1, k + 1):
        Z.append(dY[k - i : len(dY) - i])
    Zm = np.hstack(Z)
    R0 = dY[k:] - Zm @ np.linalg.lstsq(Zm, dY[k:], rcond=None)[0]
    Y1 = Ymat[k:-1]
    R1 = Y1 - Zm @ np.linalg.lstsq(Zm, Y1, rcond=None)[0]
    S00 = R0.T @ R0 / rows
    S01 = R0.T @ R1 / rows
    S11 = R1.T @ R1 / rows
    M = np.linalg.solve(S11, S01.T) @ np.linalg.solve(S00, S01)
    eigvals, eigvecs = np.linalg.eig(M)
    order = np.argsort(-eigvals.real)
    return eigvals.real[order], eigvecs.real[:, order], rows


def _trace_test_rank(eigvals: np.ndarray, rows: int, n: int) -> dict:
    """The trace-test core of find_optimal_coint_rank, split out so it
    can be exercised (and oracle-pinned) without a Spark frame: smallest
    r whose trace statistic is below the 5% critical value."""
    stats = {}
    rank = n
    for r in range(n):
        lam = np.clip(eigvals[r:], 1e-12, 1 - 1e-12)
        trace = -rows * float(np.sum(np.log(1 - lam)))
        crit = _TRACE_CRIT_5.get(n - r)
        stats[r] = {"trace": trace, "crit_5pct": crit}
        if crit is not None and trace < crit and rank == n:
            rank = r
    return {"rank": rank, "stats": stats}


def find_optimal_coint_rank(df: DataFrame, k_ar_diff: int = 1) -> dict:
    """Johansen trace test (reference util.py:390-428): smallest r whose
    trace statistic is below the 5% critical value."""
    wide = _wide(df)
    Ymat = wide.drop(columns=[DS]).to_numpy(float)
    n = Ymat.shape[1]
    eigvals, _, rows = _johansen(Ymat, k_ar_diff)
    return _trace_test_rank(eigvals, rows, n)


def vecm_fit_forecast(
    Ymat: np.ndarray, h: int, k_ar_diff: int = 1, coint_rank: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Fit VECM by two-step OLS given beta from Johansen; return
    (fitted_levels [T x n], forecast_levels [h x n])."""
    T, n = Ymat.shape
    eigvals, eigvecs, _ = _johansen(Ymat, k_ar_diff)
    beta = eigvecs[:, : max(coint_rank, 0)]
    dY = np.diff(Ymat, axis=0)
    k = k_ar_diff
    rows = len(dY) - k
    ect = (Ymat[k:-1] @ beta) if coint_rank > 0 else np.empty((rows, 0))
    X = [ect, np.ones((rows, 1))]
    for i in range(1, k + 1):
        X.append(dY[k - i : len(dY) - i])
    Xm = np.hstack(X)
    B, *_ = np.linalg.lstsq(Xm, dY[k:], rcond=None)

    fitted_d = Xm @ B
    fitted = Ymat.copy()
    fitted[k + 1 :] = Ymat[k:-1] + fitted_d

    # recursive forecast
    hist = Ymat.copy()
    out = []
    for _ in range(h):
        dhist = np.diff(hist, axis=0)
        parts = [
            (hist[-1] @ beta).reshape(1, -1) if coint_rank > 0 else np.empty((1, 0)),
            np.ones((1, 1)),
        ]
        for i in range(1, k + 1):
            parts.append(dhist[-i].reshape(1, -1))
        x = np.hstack(parts)
        dnext = x @ B
        nxt = hist[-1] + dnext.ravel()
        out.append(nxt)
        hist = np.vstack([hist, nxt])
    return fitted, np.array(out)


def vecm_model(
    df: DataFrame, features=None, k_ar_diff: int = 1,
    coint_rank: int | None = None, **_,
) -> DataFrame:
    """Registry adapter: joint fit over ALL series in the frame."""
    from pyspark.sql import types as T

    obs = df.filter(F.col("is_future") == 0) if "is_future" in df.columns else df
    wide = _wide(obs)
    cols = [c for c in wide.columns if c != DS]
    Ymat = wide[cols].to_numpy(float)
    if coint_rank is None:
        coint_rank = find_optimal_coint_rank(obs, k_ar_diff)["rank"]
        coint_rank = max(min(coint_rank, len(cols) - 1), 0)
    h = 0
    if "is_future" in df.columns:
        h = (
            df.filter(F.col("is_future") == 1)
            .groupBy(SERIES).count().agg(F.max("count")).collect()[0][0]
            or 0
        )
    fitted, fc = vecm_fit_forecast(Ymat, int(h), k_ar_diff, coint_rank)
    rows = []
    for j, sid in enumerate(cols):
        for i, ds in enumerate(wide[DS]):
            rows.append((sid, ds, float(fitted[i, j])))
    spark = df.sparkSession
    fitted_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[SERIES, DS, "forecast"])
    )
    if h:
        fut = (
            df.filter(F.col("is_future") == 1)
            .select(SERIES, DS)
            .withColumn(
                "_step",
                F.row_number().over(W.partitionBy(SERIES).orderBy(DS)),
            )
        )
        fc_rows = [
            (sid, step + 1, float(fc[step, j]))
            for j, sid in enumerate(cols)
            for step in range(int(h))
        ]
        fc_df = spark.createDataFrame(
            pd.DataFrame(fc_rows, columns=[SERIES, "_step", "forecast"])
        )
        fut_scored = fut.join(fc_df, [SERIES, "_step"]).drop("_step")
        fitted_df = fitted_df.unionByName(fut_scored)
    return df.join(fitted_df, [SERIES, DS], "left")
