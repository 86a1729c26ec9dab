"""Naive conformal intervals (SURVEY.md §2.10).

Reference semantics (Forecaster.py:188-208): ci_range = the cilevel-th
percentile of |test-set residuals|; bounds = point ± ci_range, applied to
both the forecast and the test-set predictions.

EXACT ``percentile`` (linear interpolation, matching np.percentile —
SURVEY.md §4.3) rather than percentile_approx: test windows are small
per series, so exactness is cheap; the aggregate is distributed across
(series, model) groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scalecast_spark.frame import SERIES


def conformal_widths(
    test_df: DataFrame,
    actual: str = "y",
    forecast: str = "forecast",
    cilevel: float = 0.95,
    by: list[str] | None = None,
) -> DataFrame:
    """Per-group ci width from test residuals → (by..., ci_range)."""
    by = by or [SERIES]
    return test_df.groupBy(*by).agg(
        F.expr(
            f"percentile(abs({forecast} - {actual}), {cilevel})"
        ).alias("ci_range")
    )


def apply_intervals(
    df: DataFrame,
    widths: DataFrame,
    forecast: str = "forecast",
    by: list[str] | None = None,
) -> DataFrame:
    """Attach upper/lower bound columns (point ± ci_range)."""
    by = by or [SERIES]
    return (
        df.join(F.broadcast(widths), on=by, how="left")
        .withColumn("upper", F.col(forecast) + F.col("ci_range"))
        .withColumn("lower", F.col(forecast) - F.col("ci_range"))
        .drop("ci_range")
    )
