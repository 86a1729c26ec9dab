"""Exact SHAP values for linear models — library-free.

The reference's ``reduce_Xvars`` ranks features by SHAP importance
(reference Forecaster.py:451-631, via the shap package). For a LINEAR
model the Shapley value of feature j on row i has the closed form

    phi_ij = beta_j * (x_ij - mean(x_j))

(Lundberg & Lee 2017, "Linear SHAP"), so no sampling library is
needed: fit the per-series OLS in the kernel, apply the formula, and
reduce |phi| Spark-side. Importance = mean over rows and series of
|phi_ij| — identical to shap.LinearExplainer's global ranking.

Tree estimators have no such closed form in-container; reduce_Xvars
falls back to permutation importance for them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y


def linear_shap_values(df: DataFrame, features: list[str]) -> DataFrame:
    """Per-row linear SHAP values: (series, ds, feature, phi).

    One applyInPandas pass per series: OLS fit on the observed rows,
    then phi_ij = beta_j * (x_ij - mean_j). Parallel across series —
    the scale axis; the output long frame stays distributed.
    """
    feat = list(features)
    schema = T.StructType(
        [
            T.StructField(SERIES, df.schema[SERIES].dataType),
            T.StructField(DS, df.schema[DS].dataType),
            T.StructField("feature", T.StringType()),
            T.StructField("phi", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf[IS_FUTURE] == 0].sort_values(DS)
        train = pdf.dropna(subset=feat + [Y])
        if len(train) <= len(feat) + 1:
            return pd.DataFrame(
                {SERIES: [], DS: [], "feature": [], "phi": []}
            ).astype({"phi": float})
        X = np.column_stack([train[c].to_numpy(float) for c in feat])
        yv = train[Y].to_numpy(float)
        Xi = np.column_stack([X, np.ones(len(X))])
        beta, *_ = np.linalg.lstsq(Xi, yv, rcond=None)
        mu = X.mean(axis=0)
        phi = (X - mu) * beta[:-1]  # (n, F)
        out = []
        for j, c in enumerate(feat):
            out.append(
                pd.DataFrame(
                    {
                        SERIES: train[SERIES].to_numpy(),
                        DS: train[DS].to_numpy(),
                        "feature": c,
                        "phi": phi[:, j],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return (
        df.select(SERIES, DS, IS_FUTURE, Y, *feat)
        .groupBy(SERIES)
        .applyInPandas(run, schema)
    )


def linear_shap_importance(df: DataFrame, features: list[str]) -> DataFrame:
    """Global SHAP importance: (feature, importance) where importance =
    mean over all rows and series of |phi| — the standard SHAP summary
    ranking. The reduction happens Spark-side; |features| rows reach
    the driver."""
    return (
        linear_shap_values(df, features)
        .groupBy("feature")
        .agg(F.avg(F.abs("phi")).alias("importance"))
    )
