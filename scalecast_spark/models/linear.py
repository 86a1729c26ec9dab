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
    normalizer: str | None = None,
) -> DataFrame:
    """General multi-feature OLS with recursive AR prediction — now a
    thin adapter over the shared kernel (kernel.py).

    Adds ``forecast``: in-sample one-step fitted values on observed rows
    (AR cells = actuals, matching the reference's fitted-vals
    definition), recursive dynamic predictions on future rows.
    """
    from scalecast_spark.models.kernel import run_kernel
    from scalecast_spark.models.sklearn_like import fit_ols

    return run_kernel(df, features, fit_ols, dynamic_testing, normalizer)
