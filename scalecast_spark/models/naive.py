"""Naive / seasonal-naive estimator (reference models.py:1403-1490).

Semantics to replicate:
  * in-sample fitted values: ``y.shift(m)`` → ``F.lag(y, m)`` per series;
  * future forecast: the last m observed values tiled forward
    (models.py:1474-1476).

Everything is window functions + one tiny broadcast join (the per-series
m-row tail) — no Python in the hot path, scales to any number of series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y


def naive_model(df: DataFrame, m: int | str = 1, features: list[str] | None = None) -> DataFrame:
    """Return the frame with a ``forecast`` column: lag-m in-sample,
    tiled last-season on future rows.  ``m=1`` is the plain naive;
    ``m='auto'`` resolves the seasonal-naive period from the frame's
    inferred frequency (functions/seasonal.py — reference
    util.py:58-83 freq table).

    ``features`` is accepted (and ignored) for registry signature parity.
    """
    if m == "auto":
        from scalecast_spark.functions.seasonal import resolve_m

        m = resolve_m(m, df)
    w = W.partitionBy(SERIES).orderBy(DS)

    # in-sample: one shared window sort
    out = df.withColumn("_fitted", F.lag(Y, m).over(w))

    # future: join step-i future rows to tail value at phase (i-1) % m.
    # The tail table is n_series * m rows — always broadcastable.
    tail = (
        df.filter(F.col(IS_FUTURE) == 0)
        .withColumn("_rev", F.row_number().over(W.partitionBy(SERIES).orderBy(F.desc(DS))))
        .filter(F.col("_rev") <= m)
        .select(
            SERIES,
            (m - F.col("_rev")).alias("_phase"),  # 0..m-1, oldest..newest of the tail
            F.col(Y).alias("_tail_y"),
        )
    )
    fut_step = F.row_number().over(W.partitionBy(SERIES, IS_FUTURE).orderBy(DS))
    out = (
        out.withColumn("_step", F.when(F.col(IS_FUTURE) == 1, fut_step))
        .withColumn("_phase", (F.col("_step") - 1) % m)
        .join(F.broadcast(tail), on=[SERIES, "_phase"], how="left")
        .withColumn(
            "forecast",
            F.when(F.col(IS_FUTURE) == 1, F.col("_tail_y")).otherwise(F.col("_fitted")),
        )
        .drop("_fitted", "_step", "_phase", "_tail_y")
    )
    return out
