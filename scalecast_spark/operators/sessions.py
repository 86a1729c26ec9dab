"""Event sessionization — gap-based session assignment over a raw
event stream.

Batch form here (lag + conditional running count — the standard
sessionization idiom); the streaming twin lives in
``scalecast_spark.streaming`` using ``session_window`` so the same
semantics hold under watermarks.

Scale: one shuffle on the entity key; the running count is a window
scan within each entity partition. Skewed entities (bots) can be
pre-salted by day if a single user's history outgrows a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.functions.timegrain import epoch_seconds


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800,
) -> DataFrame:
    """Assign ``session_id`` (1-based per entity): a new session starts
    when the gap since the previous event exceeds ``gap_seconds``
    (fractional allowed — gaps keep microsecond precision, so
    sub-second event streams sessionize correctly)."""
    w = W.partitionBy(entity_col).orderBy(ts_col)
    dtype = df.schema[ts_col].dataType
    sec = epoch_seconds(ts_col, dtype)
    gap = sec - epoch_seconds(F.lag(ts_col).over(w), dtype)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )


def session_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800,
) -> DataFrame:
    """Per-session aggregates: event count, duration, value sum.

    ``duration_sec`` stays integral (whole seconds, floor) for schema
    stability; the underlying gap math is microsecond-precise."""
    s = sessionize(df, entity_col, ts_col, gap_seconds)
    dtype = df.schema[ts_col].dataType
    return s.groupBy(entity_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (
            epoch_seconds(F.max(ts_col), dtype) - epoch_seconds(F.min(ts_col), dtype)
        ).cast("long").alias("duration_sec"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )
