"""Advanced conformal-interval machinery (SURVEY.md §2.10).

  * step-wise dynamic intervals — the reference backtests ≥ 1/alpha
    iterations, builds a residual matrix (iteration × step), and
    overwrites each forecast step's CI with the per-step residual
    percentile (util.py:1157-1270). Here the residual "matrix" is the
    long backtest results frame; per-step widths are ONE
    groupBy(step).percentile pass.
  * transfer_cis — copy a fitted model's interval widths onto another
    model/object (reference _Forecaster_parent.py:295-361): widths are
    a small DataFrame, so transfer is literally handing it over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.frame import DS, SERIES, Y


def backtest_resid_steps(results: DataFrame) -> DataFrame:
    """Attach the forecast step index (1-based position within each
    (model, iteration, series) window) to backtest results — the
    engine's residual matrix (reference backtest_for_resid_matrix /
    get_backtest_resid_matrix, util.py:1157-1235)."""
    w = W.partitionBy("model", "iteration", SERIES).orderBy(DS)
    return results.withColumn("step", F.row_number().over(w)).withColumn(
        "resid", F.col("forecast") - F.col(Y)
    )


def stepwise_widths(
    resid_steps: DataFrame, cilevel: float = 0.95
) -> DataFrame:
    """Per-(model, series, step) interval half-width = cilevel
    percentile of |residual| across backtest iterations
    (reference overwrite_forecast_intervals, util.py:1237-1270)."""
    return resid_steps.groupBy("model", SERIES, "step").agg(
        F.expr(f"percentile(abs(resid), {cilevel})").alias("ci_range")
    )


def apply_stepwise_intervals(
    forecast_df: DataFrame, widths: DataFrame, model: str
) -> DataFrame:
    """Join per-step widths onto a horizon forecast (widths grow with
    step, unlike the flat naive-conformal band)."""
    w = W.partitionBy(SERIES).orderBy(DS)
    fc = forecast_df.withColumn("step", F.row_number().over(w))
    mw = widths.filter(F.col("model") == model).drop("model")
    return (
        fc.join(F.broadcast(mw), [SERIES, "step"], "left")
        .withColumn("upper", F.col("forecast") + F.col("ci_range"))
        .withColumn("lower", F.col("forecast") - F.col("ci_range"))
        .drop("ci_range", "step")
    )


def transfer_cis(
    widths: DataFrame,
) -> DataFrame:
    """Interval widths are plain data in this engine — transfer between
    models/objects is returning the same frame (kept as an explicit op
    for API parity with _Forecaster_parent.py:295-361)."""
    return widths
