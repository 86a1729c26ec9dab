"""Sinks: partitioned / bucketed writers and format-gated lakehouse
adapters.

The reference exports to CSV/Excel from pandas (Forecaster.py:2065-2219
presentation tier); at 100 TB the equivalents are:

  * ``write_partitioned`` — parquet partitioned by low-cardinality
    columns (partition pruning on read: a `WHERE series_id = x` scan
    touches one directory).
  * ``write_bucketed`` — saveAsTable with ``bucketBy(series_id)``: a
    downstream join or groupBy on the bucket column skips its shuffle
    entirely (co-located join), the standard layout for a frame that is
    repeatedly joined on the same key (signals join-back, Xvar joins,
    fold filters).
  * ``write_delta`` / ``write_iceberg`` — import/config-gated: the
    connector jars aren't in this container, so these raise a clear
    error unless the catalog is configured; the call shape is the real
    one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Parquet partitioned by ``partition_cols`` — directory-level
    partition pruning for every downstream read that filters on them."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "series_id",
    n_buckets: int = 32,
    sort_col: str | None = "ds",
    mode: str = "overwrite",
) -> None:
    """saveAsTable with bucketing (+ optional in-bucket sort): joins
    and aggregations keyed on ``bucket_col`` read co-located buckets
    and skip the shuffle; the in-bucket sort feeds window operators
    without a per-query sort."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def _require_format(spark: SparkSession, fmt: str, extension_class: str) -> None:
    exts = spark.conf.get("spark.sql.extensions", "") or ""
    if extension_class not in exts:
        raise RuntimeError(
            f"{fmt} connector not configured in this session "
            f"(spark.sql.extensions lacks {extension_class}); add the "
            f"{fmt} jars + extension on a real deployment"
        )


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Delta Lake sink — gated on the Delta extension being loaded."""
    _require_format(
        df.sparkSession, "delta", "io.delta.sql.DeltaSparkSessionExtension"
    )
    df.write.format("delta").mode(mode).save(path)  # pragma: no cover


def write_iceberg(df: DataFrame, table: str, mode: str = "overwrite") -> None:
    """Apache Iceberg sink — gated on the Iceberg extension."""
    _require_format(
        df.sparkSession,
        "iceberg",
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    )
    df.writeTo(table).using("iceberg").createOrReplace()  # pragma: no cover
