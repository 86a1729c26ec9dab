"""Exogenous-regressor ingest (SURVEY.md §2.1).

  * ingest_Xvars_df — join an external regressor table by date:
    left join on ds, optional zero-padding, one-hot dummying of string
    columns with a deterministic vocabulary (reference
    _Forecaster_parent.py:1471-1543 uses pd.get_dummies).
  * add_series — another series as a regressor, date-aligned + padded
    (reference _Forecaster_parent.py:1436-1469).

Both are broadcast joins when the regressor table is dimension-sized;
Catalyst picks sort-merge automatically if it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scalecast_spark.frame import DS, SERIES, Y


def ingest_Xvars_df(
    df: DataFrame,
    xdf: DataFrame,
    date_col: str = "ds",
    pad: bool = False,
    dummify: bool = True,
) -> tuple[DataFrame, list[str]]:
    """Join every non-date column of ``xdf`` onto the frame by date.

    String columns become 0/1 dummies over their observed vocabulary
    (collected once — vocabulary-sized, not data-sized). ``pad=True``
    zero-fills dates missing from xdf (reference pad semantics).
    """
    xdf = xdf.withColumnRenamed(date_col, DS)
    names: list[str] = []
    for c, dtype in xdf.dtypes:
        if c == DS:
            continue
        if dtype == "string" and dummify:
            vocab = sorted(
                r[0] for r in xdf.select(c).distinct().collect() if r[0] is not None
            )
            for v in vocab:
                nm = f"{c}_{v}"
                xdf = xdf.withColumn(nm, (F.col(c) == v).cast("double"))
                names.append(nm)
            xdf = xdf.drop(c)
        else:
            xdf = xdf.withColumn(c, F.col(c).cast("double"))
            names.append(c)
    out = df.join(F.broadcast(xdf), on=DS, how="left")
    if pad:
        for nm in names:
            out = out.withColumn(nm, F.coalesce(F.col(nm), F.lit(0.0)))
    return out, names


def add_series(
    df: DataFrame,
    other: DataFrame,
    called: str,
    pad: bool = True,
) -> tuple[DataFrame, list[str]]:
    """Another (series_id, ds, y) series as a regressor column, aligned
    by ds and 0-padded (reference add_series)."""
    side = other.select(DS, F.col(Y).alias(called))
    out = df.join(F.broadcast(side), on=DS, how="left")
    if pad:
        out = out.withColumn(called, F.coalesce(F.col(called), F.lit(0.0)))
    return out, [called]
