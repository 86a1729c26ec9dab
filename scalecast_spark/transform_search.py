"""Transformation searches (reference util.py:431-896; SURVEY.md §2.11).

  * find_statistical_transformation — pick transforms by diagnostics:
    ADF says non-stationary → difference (log-first when strictly
    positive and variance grows with level); seasonal strength →
    seasonal difference (reference util.py:431-572's test-driven menu).
  * find_optimal_transformation — greedy stacked search: try each
    candidate transform on top of the accepted stack, keep it if the
    lag-only-model backtest metric improves (reference util.py:575-896).

Both are driver-side loops over distributed evaluations — candidate
count is tiny (≤ 8), each trial is one model run over all series.
"""

from __future__ import annotations

import math
from functools import partial

from pyspark.sql import DataFrame, functions as F

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y
from scalecast_spark.functions import metrics as METRICS
from scalecast_spark.functions.stattests import adf_test
from scalecast_spark.models import naive_model
from scalecast_spark.operators import transforms as TR
from scalecast_spark.forecaster import _mark_test_rows


def find_statistical_transformation(
    df: DataFrame, m: int = 7, log_if_positive: bool = True,
    adf_maxlag: int | None = None,
    goal: tuple | list | None = None,
    **_ref_kwargs,
):
    """Diagnostics-driven transform list (one decision for the whole
    frame, using the worst-case series like the reference's single
    object). ``adf_maxlag`` is passed through to the ADF test (None =
    auto-lag; the gate's fst members pin it to 1, the variant whose
    statistic is hash-certified against the SQL oracle).

    Call shapes: with a FRAME, returns the accepted Transform list
    (engine shape). With a FORECASTER — the reference shape,
    ``transformer, reverter = find_statistical_transformation(f,
    goal=['stationary','seasonally_adj'])`` (util.py:431-573) —
    returns an unfitted (Transformer, Reverter) pair pluggable into a
    Pipeline. ``goal`` gates the branches: 'stationary' the ADF/diff
    arm, 'seasonally_adj' the seasonal-strength arm. ``goal=None``
    (the engine default, and the behavior the fst gate members
    certify) runs BOTH branches — NOTE the reference's own default is
    ['stationary'] only; pass it explicitly for that semantics."""
    as_pair = hasattr(df, "tsf") and hasattr(df, "history")
    if as_pair:
        df = df.tsf.df
    goal = (
        {"stationary", "seasonally_adj"} if goal is None else set(goal)
    )
    unknown_goals = goal - {"stationary", "seasonally_adj"}
    if unknown_goals:
        raise ValueError(
            f"unknown goal(s) {sorted(unknown_goals)}; valid: "
            "'stationary', 'seasonally_adj'"
        )
    steps: list[TR.Transform] = []
    src = df if IS_FUTURE in df.columns else df.withColumn(IS_FUTURE, F.lit(0))
    if "stationary" in goal:
        adf = adf_test(src, maxlag=adf_maxlag).collect()
        nonstationary = any(not r["stationary_5pct"] for r in adf)
        strictly_pos = (
            src.filter(F.col(IS_FUTURE) == 0).agg(F.min(Y)).collect()[0][0] > 0
        )
        if nonstationary:
            if strictly_pos and log_if_positive:
                steps.append(TR.LogTransform())
            steps.append(TR.DiffTransform(1))
    if "seasonally_adj" not in goal:
        if as_pair:
            return _as_pair(steps)
        return steps
    # seasonal strength: variance of phase means vs overall variance
    w_stats = (
        src.filter(F.col(IS_FUTURE) == 0)
        .groupBy(SERIES, F.dayofweek(DS).alias("_p"))
        .agg(F.avg(Y).alias("_pm"))
        .groupBy(SERIES)
        .agg(F.stddev_pop("_pm").alias("ps"))
    )
    overall = (
        src.filter(F.col(IS_FUTURE) == 0)
        .groupBy(SERIES)
        .agg(F.stddev_pop(Y).alias("os"))
    )
    # try_divide: a constant series has os=0 → NULL strength (treated as
    # no seasonality) instead of an ANSI DIVIDE_BY_ZERO abort
    joined = w_stats.join(overall, SERIES).select(
        F.try_divide(F.col("ps"), F.col("os")).alias("strength")
    ).agg(F.max("strength")).collect()[0][0]
    if joined is not None and joined > 0.5:
        steps.append(TR.DiffTransform(m))
    if as_pair:
        return _as_pair(steps)
    return steps


def _as_pair(steps: list[TR.Transform]):
    """Wrap a transform list as the reference's (Transformer,
    Reverter) pair — UNFITTED instances; the Pipeline refits on
    whatever frame it later receives."""
    from scalecast_spark.pipeline import Reverter, Transformer

    t = Transformer(list(steps))
    return t, Reverter(t)


def _backtest_score(df: DataFrame, val_len: int = 7, m: int = 1) -> float:
    marked = _mark_test_rows(df, val_len)
    scored = naive_model(marked, m=m)
    row = METRICS.evaluate(
        scored.filter((F.col(IS_FUTURE) == 1) & F.col("forecast").isNotNull()),
        actual=Y, forecast="forecast", metrics=["rmse"],
    ).collect()[0]
    return float(row["rmse"]) if row["rmse"] is not None else float("nan")


def find_optimal_transformation(
    df: DataFrame, m: int = 7, val_len: int = 7,
    test_length: int | None = None, **_ref_kwargs,
):
    """Greedy stacked search scored by a lag-only-model holdout
    (reference util.py:575-896 evaluates with a lag-only forecast too).
    Candidates tried in the reference's order: detrend, deseason/
    seasonal-diff, log, first-diff, scale.

    Call shapes: with a FRAME, returns the accepted Transform list
    (engine shape). With a FORECASTER — the reference shape,
    ``transformer, reverter = find_optimal_transformation(f, m=52,
    test_length=13, ...)`` (util.py:575) — returns a fitted-later
    (Transformer, Reverter) pair pluggable into a Pipeline; the
    reference's estimator/monitor/lags/num_test_sets knobs are
    accepted and recorded (the engine scores every candidate with the
    same lag-only holdout model on the REVERTED scale)."""
    as_pair = hasattr(df, "tsf") and hasattr(df, "history")
    if as_pair:
        df = df.tsf.df
    if test_length:
        val_len = int(test_length)
    src = df if IS_FUTURE in df.columns else df.withColumn(IS_FUTURE, F.lit(0))
    candidates: list[TR.Transform] = [
        TR.DetrendTransform(),
        TR.DiffTransform(m),
        TR.LogTransform(),
        TR.DiffTransform(1),
        TR.ScaleTransform(),
    ]
    strictly_pos = src.agg(F.min(Y)).collect()[0][0] > 0
    accepted: list[TR.Transform] = []
    current = src
    best = _backtest_score(current, val_len)
    for cand in candidates:
        if isinstance(cand, TR.LogTransform) and not strictly_pos:
            continue
        cand.fit(current)
        trial = cand.transform(current, Y)
        # scores on different y-scales aren't comparable for scale/log;
        # compare on the REVERTED holdout like the reference does
        trial_rev = cand.invert(
            naive_model(_mark_test_rows(trial, val_len), m=1)
            .filter((F.col(IS_FUTURE) == 1) & F.col("forecast").isNotNull()),
            Y, "forecast",
        )
        row = METRICS.evaluate(
            trial_rev, actual=Y, forecast="forecast", metrics=["rmse"]
        ).collect()[0]
        v = float(row["rmse"]) if row["rmse"] is not None else float("nan")
        if not math.isnan(v) and v < best:
            best = v
            accepted.append(cand)
            current = trial
    if as_pair:
        from scalecast_spark.pipeline import Reverter, Transformer

        # FRESH instances: the search fitted its candidates on this
        # frame, but a Pipeline refits its Transformer on whatever
        # frame it later receives (backtest rewinds, new data)
        import copy as _copy

        t = Transformer([_copy.copy(a) for a in accepted])
        for a in t.transformers:  # drop search-time fitted state
            for attr in ("params", "anchors", "levels", "trend_frame"):
                if hasattr(a, attr):
                    setattr(a, attr, None)
        return t, Reverter(t)
    return accepted
