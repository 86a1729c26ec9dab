"""Forecast-accuracy metrics as Spark aggregate expressions
(SURVEY.md §2.6; reference src/scalecast/Metrics.py).

Each metric is a Column-expression factory over (actual, forecast)
columns, so one ``groupBy(model, series).agg(*metric_exprs(...))`` pass
computes every metric for every model and series simultaneously — the
reference computes them one scalar at a time on numpy arrays.

Numerical-parity notes (SURVEY.md §4.3):
  * mape is NULL when any actual == 0 (Metrics.py:69-72's NaN rule);
  * the reference registry mis-wires abias/bias to smape (cfg.py:62-63,
    an upstream bug) — we wire the TRUE definitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

LOWER_IS_BETTER = {
    "rmse": True, "mse": True, "mae": True, "mape": True, "smape": True,
    "mase": True, "msis": True, "bias": False, "abias": True, "r2": False,
}

DEFAULT_METRICS = ["rmse", "r2", "mae", "mape"]


def bias(a: str, f: str) -> Column:
    """Sum of (forecast - actual) (reference Metrics.py:13-31)."""
    return F.sum(F.col(f) - F.col(a))


def abias(a: str, f: str) -> Column:
    """|bias| (reference Metrics.py:33-51)."""
    return F.abs(F.sum(F.col(f) - F.col(a)))


def mse(a: str, f: str) -> Column:
    return F.avg(F.pow(F.col(f) - F.col(a), 2.0))


def rmse(a: str, f: str) -> Column:
    return F.sqrt(mse(a, f))


def mae(a: str, f: str) -> Column:
    return F.avg(F.abs(F.col(f) - F.col(a)))


def mape(a: str, f: str) -> Column:
    """Mean absolute percentage error; NULL if any actual is 0
    (reference Metrics.py:53-72)."""
    return F.when(
        F.min(F.abs(F.col(a))) > 0,
        F.avg(F.abs(F.try_divide(F.col(f) - F.col(a), F.col(a)))),
    )


def r2(a: str, f: str) -> Column:
    """1 - SSE/SST (reference Metrics.py:75-91 via sklearn r2_score).
    SST via the sum-of-squares identity so it stays a single aggregate
    pass: SST = sum(a^2) - sum(a)^2/n."""
    sse = F.sum(F.pow(F.col(a) - F.col(f), 2.0))
    sst = F.sum(F.pow(F.col(a), 2.0)) - F.pow(F.sum(F.col(a)), 2.0) / F.count(F.col(a))
    return 1.0 - F.try_divide(sse, sst)


def smape(a: str, f: str) -> Column:
    """M4 symmetric MAPE, no x100 (reference Metrics.py:147-175).
    try_divide: actual==forecast==0 rows become NULL and are skipped by
    avg (ANSI mode would otherwise abort on DIVIDE_BY_ZERO).

    DELIBERATE divergence from the reference on degenerate rows: numpy
    0/0 yields NaN which propagates, so the reference returns NaN for a
    whole series containing one exact-zero-agreement row; here such
    rows are excluded from the mean (a finite value). The DuckDB oracle
    (ts_metrics / ts_backtest_metrics) restates the same NULL-skip
    convention, so both engines agree with each other."""
    return F.avg(
        F.try_divide(
            2.0 * F.abs(F.col(f) - F.col(a)),
            F.abs(F.col(a)) + F.abs(F.col(f)),
        )
    )


METRIC_EXPRS = {
    "bias": bias,
    "abias": abias,
    "mse": mse,
    "rmse": rmse,
    "mae": mae,
    "mape": mape,
    "r2": r2,
    "smape": smape,
}


def metric_exprs(a: str, f: str, metrics: list[str] | None = None) -> list[Column]:
    """Aliased aggregate columns for groupBy().agg(*...). ``r2`` needs
    the two-aggregate identity and is included here directly."""
    metrics = metrics or DEFAULT_METRICS
    return [METRIC_EXPRS[m](a, f).alias(m) for m in metrics]


def evaluate(
    df: DataFrame,
    actual: str = "actual",
    forecast: str = "forecast",
    by: list[str] | None = None,
    metrics: list[str] | None = None,
) -> DataFrame:
    """Grouped metric evaluation — the engine's ``backtest_metrics``
    reducer shape (reference util.py:112-230)."""
    exprs = metric_exprs(actual, forecast, metrics)
    if by:
        return df.groupBy(*by).agg(*exprs)
    return df.agg(*exprs)


def mase_denominator(train_df: DataFrame, y: str = "y", series: str = "series_id", ds: str = "ds", m: int = 1) -> DataFrame:
    """In-sample seasonal-naive MAE per series — the M4 MASE scaling
    term (reference Metrics.py:177-206). Joined back to scale test MAE."""
    from pyspark.sql import Window as W

    w = W.partitionBy(series).orderBy(ds)
    return (
        train_df.withColumn("_l", F.lag(y, m).over(w))
        .filter(F.col("_l").isNotNull())
        .groupBy(series)
        .agg(F.avg(F.abs(F.col(y) - F.col("_l"))).alias("mase_denom"))
    )
