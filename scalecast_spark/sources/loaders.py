"""Parquet source adapters.

The reference ingests arrays/Series handed to ``Forecaster.__init__``
(reference src/scalecast/Forecaster.py:67-94). The Spark engine ingests
tables: any parquet/Delta/JDBC source that can be shaped into the long
(series_id, ds, y) format. ``events_to_series`` is the canonical shaping
op for the driver's event-stream table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from scalecast_spark.frame import DS, SERIES, Y

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Column pruning + predicate pushdown are
    Catalyst's job — callers select/filter on the returned frame.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark reads only as
    long (spark.sql.legacy.parquet.nanosAsLong); convert via integer
    division to keep microsecond precision (a float division would lose
    precision above 2^53 ns).
    """
    if name == "events":
        # TIMESTAMP(NANOS) parquet needs this session conf; the caller's
        # session (e.g. the driver harness) may not have it — it is a
        # runtime-settable SQL conf, so set it here rather than relying
        # on get_session having built the session
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def events_to_series(
    events: DataFrame,
    bucket: str = "day",
    series_col: str = "event_type",
    value_col: str = "value",
    agg: str = "sum",
) -> DataFrame:
    """Resample the raw event stream into the long time-series format.

    One shuffle on (series_id, ds); partial aggregation happens map-side
    so at 100 TB the shuffle carries only (n_series × n_buckets) rows.
    """
    agg_expr = {
        "sum": F.sum(value_col),
        "avg": F.avg(value_col),
        "count": F.count(F.lit(1)).cast("double"),
        "max": F.max(value_col),
        "min": F.min(value_col),
    }[agg]
    return (
        events.groupBy(
            F.col(series_col).cast("string").alias(SERIES),
            F.date_trunc(bucket, F.col("ts")).alias(DS),
        )
        .agg(agg_expr.cast("double").alias(Y))
    )
