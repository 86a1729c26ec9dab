"""Multi-series (MV) operators (reference MVForecaster.py /
multiseries.py; SURVEY.md §2.6, §2.4).

In the long format, multivariate analysis = self-joins / pivots on
(series_id, ds); the reference's dict-of-series machinery disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.frame import DS, SERIES, Y


def corr_matrix(df: DataFrame, train_only_cutoff=None) -> DataFrame:
    """Pairwise Pearson correlation across series sharing dates
    (reference MVForecaster.corr, MVForecaster.py:1012-1049).

    Inner self-join on ds aligns observations; ``F.corr`` aggregates per
    (series_a, series_b). One shuffle on ds + one on the pair key.
    """
    src = df
    if train_only_cutoff is not None:
        src = src.filter(F.col(DS) <= F.lit(train_only_cutoff))
    a = src.select(F.col(SERIES).alias("series_a"), DS, F.col(Y).alias("ya"))
    b = src.select(F.col(SERIES).alias("series_b"), DS, F.col(Y).alias("yb"))
    return (
        a.join(b, DS)
        .groupBy("series_a", "series_b")
        .agg(F.round(F.corr("ya", "yb"), 6).alias("corr"))
    )


def corr_lags(
    df: DataFrame, series_x: str, series_y: str, lags: int = 5
) -> DataFrame:
    """corr(y_series, x_series lagged k) for k=1..lags (reference
    MVForecaster.corr_lags, MVForecaster.py:1051-1074). Output one row
    per lag."""
    w = W.partitionBy(SERIES).orderBy(DS)
    x = (
        df.filter(F.col(SERIES) == series_x)
        .select(DS, F.col(Y).alias("x"), *[
            F.lag(Y, k).over(w).alias(f"x_lag_{k}") for k in range(1, lags + 1)
        ])
    )
    ydf = df.filter(F.col(SERIES) == series_y).select(DS, F.col(Y).alias("yy"))
    joined = ydf.join(x, DS)
    out = None
    for k in range(1, lags + 1):
        row = joined.agg(
            F.lit(k).alias("lag"),
            F.round(F.corr("yy", f"x_lag_{k}"), 6).alias("corr"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def line_up_dates(df: DataFrame) -> DataFrame:
    """Trim all series to the common (intersection) date range
    (reference multiseries.line_up_dates, multiseries.py:25-53):
    max of min-dates .. min of max-dates, computed in one tiny agg and
    broadcast back as a filter."""
    bounds = df.groupBy(SERIES).agg(
        F.min(DS).alias("lo"), F.max(DS).alias("hi")
    )
    common = bounds.agg(
        F.max("lo").alias("lo"), F.min("hi").alias("hi")
    ).collect()[0]
    return df.filter(F.col(DS).between(common["lo"], common["hi"]))
