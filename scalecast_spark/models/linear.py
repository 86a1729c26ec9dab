"""Linear-family estimators.

Two physical strategies for the same logical operator (SURVEY.md §7.4 #5):

* ``linear_trend_model`` — closed-form per-series OLS on the time index
  via ``regr_slope``/``regr_intercept`` aggregates. Pure JVM expressions,
  one aggregate pass + broadcast join; the preferred plan whenever the
  design matrix is a single regressor.

* ``linear_model`` — the general kernel: per-series fit of a multi-feature
  OLS (numpy lstsq) inside ``applyInPandas``, including the reference's
  RECURSIVE multi-step prediction semantics (models.py:109-149): predict
  step i, write the prediction into the ar_k feature cells of later
  steps, repeat. Sequential in the horizon (irreducibly — each step
  consumes the previous prediction), parallel across series. With
  ``dynamic_testing=k`` the kernel peeks the true actual every k-th step
  (models.py:124-127).

At 100 TB the fleet of series spreads across executors by series_id;
each group is one modest pandas frame (a series' own history), so the
Arrow transfer is small and bounded per task.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, Window as W
from pyspark.sql import types as T

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y

_AR_RE = re.compile(r"^ar_(\d+)$")


def linear_trend_model(df: DataFrame) -> DataFrame:
    """OLS y ~ t per series, closed form; adds ``forecast`` (fitted on
    observed rows, extrapolated trend on future rows)."""
    w = W.partitionBy(SERIES).orderBy(DS)
    out = df.withColumn("_t", F.row_number().over(w).cast("double"))
    params = (
        out.filter(F.col(IS_FUTURE) == 0)
        .groupBy(SERIES)
        .agg(
            F.expr(f"regr_slope({Y}, _t)").alias("_slope"),
            F.expr(f"regr_intercept({Y}, _t)").alias("_icept"),
        )
    )
    return (
        out.join(F.broadcast(params), SERIES)
        .withColumn("forecast", F.col("_icept") + F.col("_slope") * F.col("_t"))
        .drop("_t", "_slope", "_icept")
    )


def linear_model(
    df: DataFrame,
    features: list[str],
    dynamic_testing: bool | int = True,
) -> DataFrame:
    """General multi-feature OLS with recursive AR prediction.

    Adds ``forecast``: in-sample one-step fitted values on observed rows
    (AR cells = actuals, matching the reference's fitted-vals
    definition), recursive dynamic predictions on future rows.
    """
    ar_lags = {int(m.group(1)): c for c in features for m in [_AR_RE.match(c)] if m}
    feat = list(features)
    peek_every = (
        0 if dynamic_testing is True else 1 if dynamic_testing is False else int(dynamic_testing)
    )

    schema = T.StructType(
        [
            T.StructField(SERIES, df.schema[SERIES].dataType),
            T.StructField(DS, df.schema[DS].dataType),
            T.StructField(IS_FUTURE, T.IntegerType()),
            T.StructField(Y, T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )

    def fit_predict(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(DS).reset_index(drop=True)
        obs = pdf[pdf[IS_FUTURE] == 0]
        train = obs.dropna(subset=feat + [Y])
        if len(train) <= len(feat):
            pdf["forecast"] = np.nan
            return pdf[[SERIES, DS, IS_FUTURE, Y, "forecast"]]
        X = np.column_stack([train[c].to_numpy(float) for c in feat] + [np.ones(len(train))])
        beta, *_ = np.linalg.lstsq(X, train[Y].to_numpy(float), rcond=None)

        def predict_row(row) -> float:
            x = np.array([row[c] for c in feat] + [1.0], dtype=float)
            return float(x @ beta)

        # in-sample fitted values: one-step-ahead with actual AR cells
        fitted = np.full(len(pdf), np.nan)
        ok = pdf[feat].notna().all(axis=1) & (pdf[IS_FUTURE] == 0)
        if ok.any():
            Xall = np.column_stack(
                [pdf.loc[ok, c].to_numpy(float) for c in feat] + [np.ones(ok.sum())]
            )
            fitted[ok.to_numpy()] = Xall @ beta

        # recursive horizon: maintain the rolling tail of y-or-prediction
        hist = list(obs[Y].to_numpy(float))
        fut_idx = pdf.index[pdf[IS_FUTURE] == 1].tolist()
        for step, i in enumerate(fut_idx, start=1):
            row = pdf.loc[i].copy()
            for k, cname in ar_lags.items():
                if pd.isna(row[cname]):
                    row[cname] = hist[-k]
            pred = predict_row(row)
            fitted[i] = pred
            actual = pdf.at[i, Y]
            # dynamic_testing=k: peek the true actual every k-th step
            if peek_every and step % peek_every == 0 and not pd.isna(actual):
                hist.append(float(actual))
            else:
                hist.append(pred)
        pdf["forecast"] = fitted
        return pdf[[SERIES, DS, IS_FUTURE, Y, "forecast"]]

    preds = (
        df.select(SERIES, DS, IS_FUTURE, Y, *feat)
        .groupBy(SERIES)
        .applyInPandas(fit_predict, schema)
    )
    return df.join(preds.select(SERIES, DS, "forecast"), on=[SERIES, DS], how="left")
