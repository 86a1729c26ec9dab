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


_EXT_FMT = {
    ".parquet": "parquet", ".orc": "orc", ".csv": "csv",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
    ".txt": "text", ".tsv": "csv",
}


def _parquet_nanos_cols(path: str) -> list:
    """Column names stored as parquet TIMESTAMP(NANOS) — the pandas /
    pyarrow ``to_parquet`` default (datetime64[ns]). Spark cannot read
    that logical type natively (PARQUET_TYPE_ILLEGAL), or, with
    ``spark.sql.legacy.parquet.nanosAsLong``, reads it as a raw bigint
    of nanoseconds. Footer-only inspection: reads metadata, not data,
    so it is O(files) regardless of table size."""
    try:
        import pyarrow as pa
        import pyarrow.dataset as pads

        schema = pads.dataset(path, format="parquet").schema
        return [
            f.name for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Format-inferring reader for the sources a reference user brings
    along (the reference's own examples ingest CSVs —
    e.g. examples/avocado.csv pandas reads): parquet / orc / csv /
    json(-lines) / text, chosen by extension or explicit ``fmt``.

    Scale notes baked into the defaults:
      * CSV/JSON get ``header=true`` and, ONLY when no ``schema`` is
        passed, ``inferSchema=true`` — inference costs an extra full
        scan, so at 100 TB pass an explicit schema (or sample a file
        first); parquet/orc carry their own schema and never pay this.
      * ``.tsv`` maps to csv with a tab separator.
      * every extra keyword lands in ``DataFrameReader.option``
        untouched (compression, timestampFormat, multiLine, ...).
      * pandas' default ``to_parquet`` writes TIMESTAMP(NANOS)
        columns, which this Spark can't read natively; they are
        footer-detected and converted to proper timestamps
        (microsecond truncation — integer division, no float
        round-trip), so a user's default pandas file just loads.
      * an unrecognized extension raises instead of guessing — the
        parquet default applies only to extensionless / directory
        paths (Spark-written datasets).
    """
    import os

    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        if ext and ext not in _EXT_FMT:
            raise ValueError(
                f"read_any: unsupported extension {ext!r} for {path!r}; "
                f"pass fmt= explicitly (one of "
                f"{sorted(set(_EXT_FMT.values()))}) or use a supported "
                f"extension ({sorted(_EXT_FMT)})"
            )
        fmt = _EXT_FMT.get(ext, "parquet")
    ns_cols = _parquet_nanos_cols(path) if fmt == "parquet" else []
    if ns_cols:
        # runtime-settable SQL conf; without it the read throws
        # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS) columns
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        opts = {"header": "true"}
        if path.rstrip("/").lower().endswith(".tsv"):
            opts["sep"] = "\t"
        if schema is None:
            opts["inferSchema"] = "true"
        opts.update({k: str(v) for k, v in options.items()})
        reader = reader.options(**opts)
    elif fmt == "json":
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    elif options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    dtypes = dict(df.dtypes) if ns_cols else {}
    for c in ns_cols:
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def long_from_columns(
    df: DataFrame,
    series_col: str,
    ds_col: str,
    y_col: str,
) -> DataFrame:
    """Shape arbitrary (series, date, value) columns into the engine's
    canonical long format (series_id string, ds, y double) — the
    bridge from any ``read_any`` frame to ``TimeSeriesFrame.from_long``
    (the reference's ``Forecaster(current_dates=…, y=…)`` ingest,
    src/scalecast/Forecaster.py:67-94, generalized to a distributed
    table of MANY series). Pure projection: no shuffle, pushdown-safe."""
    ds = F.col(ds_col)
    if dict(df.dtypes).get(ds_col) == "string":
        ds = F.to_timestamp(ds)
    return df.select(
        F.col(series_col).cast("string").alias(SERIES),
        ds.alias(DS),
        F.col(y_col).cast("double").alias(Y),
    )


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
