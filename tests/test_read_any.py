"""Format-inferring source adapter (sources.read_any +
long_from_columns): CSV / TSV / JSON-lines / parquet frames all shape
into the canonical long format and flow through the engine unchanged —
the ingest path a reference user brings (the reference's examples read
CSVs into pandas; Forecaster.py:67-94 ingest)."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.sources import (
    events_to_series,
    load_table,
    long_from_columns,
    read_any,
)


@pytest.fixture(scope="module")
def series_pdf(spark, sf_dir):
    """The daily series as pandas — the write-side fixture every
    format variant round-trips."""
    return (
        events_to_series(load_table(spark, sf_dir, "events"))
        .orderBy("series_id", "ds")
        .toPandas()
    )


def _normalize(df):
    out = df.orderBy("series_id", "ds").toPandas()
    out["ds"] = out["ds"].astype("datetime64[us]")
    return out.reset_index(drop=True)


@pytest.mark.parametrize("fmt", ["csv", "tsv", "json", "parquet"])
def test_round_trip_formats(spark, tmp_path, series_pdf, fmt):
    pdf = series_pdf.copy()
    pdf["ds"] = pdf["ds"].astype(str)  # text formats carry strings
    path = str(tmp_path / f"series.{fmt}")
    if fmt == "csv":
        pdf.to_csv(path, index=False)
    elif fmt == "tsv":
        pdf.to_csv(path, index=False, sep="\t")
    elif fmt == "json":
        pdf.to_json(path, orient="records", lines=True)
    else:
        import pandas as pd  # noqa: F401

        pdf2 = series_pdf.copy()
        pdf2.to_parquet(path)
    raw = read_any(spark, path)
    got = _normalize(long_from_columns(raw, "series_id", "ds", "y"))
    want = series_pdf.copy()
    want["ds"] = want["ds"].astype("datetime64[us]")
    assert got["series_id"].tolist() == want["series_id"].tolist()
    assert got["ds"].tolist() == want["ds"].tolist()
    assert got["y"].round(6).tolist() == want["y"].round(6).tolist()


def test_nanos_parquet_reads_as_timestamp(spark, tmp_path, series_pdf):
    """pandas' DEFAULT to_parquet (datetime64[ns] -> TIMESTAMP(NANOS))
    must land as a real timestamp column with the original values —
    the single most likely real-user input to this helper."""
    path = str(tmp_path / "nanos.parquet")
    series_pdf.to_parquet(path)
    raw = read_any(spark, path)
    assert dict(raw.dtypes)["ds"] == "timestamp"
    got = raw.orderBy("series_id", "ds").toPandas()
    want = series_pdf.copy()
    want["ds"] = want["ds"].astype("datetime64[us]")
    assert got["ds"].tolist() == want["ds"].tolist()


def test_unknown_extension_raises(spark, tmp_path):
    """An unrecognized extension must fail fast with the supported
    list, not fall through to a confusing 'not a Parquet file'."""
    with pytest.raises(ValueError, match="unsupported extension"):
        read_any(spark, str(tmp_path / "data.xlsx"))


def test_explicit_schema_skips_inference(spark, tmp_path, series_pdf):
    """An explicit schema must be honored verbatim (the 100 TB path —
    no inference scan) and types land as declared."""
    pdf = series_pdf.copy()
    pdf["ds"] = pdf["ds"].astype(str)
    path = str(tmp_path / "series_schema.csv")
    pdf.to_csv(path, index=False)
    raw = read_any(
        spark, path, schema="series_id string, ds string, y double"
    )
    assert dict(raw.dtypes) == {
        "series_id": "string", "ds": "string", "y": "double"
    }
    assert raw.count() == len(series_pdf)


def test_csv_flows_into_model(spark, tmp_path, series_pdf):
    """End-to-end: CSV -> read_any -> long_from_columns ->
    TimeSeriesFrame -> naive forecast — the switcher's first session."""
    from scalecast_spark.frame import TimeSeriesFrame
    from scalecast_spark.models import naive_model

    pdf = series_pdf.copy()
    pdf["ds"] = pdf["ds"].astype(str)
    path = str(tmp_path / "user.csv")
    pdf.to_csv(path, index=False)
    long = long_from_columns(read_any(spark, path), "series_id", "ds", "y")
    tsf = TimeSeriesFrame.from_long(long).generate_future_dates(7)
    out = naive_model(tsf.df)
    future = out.filter("is_future = 1 AND forecast IS NOT NULL")
    assert future.count() == 7 * series_pdf["series_id"].nunique()
