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
    normalize: bool = True,
) -> DataFrame:
    """Average ``value_col`` across ``models`` per (series, ds).

    ``results`` is the long results frame (model, series_id, ds, kind,
    forecast ...). Returns (series_id, ds, kind, forecast).

    ``normalize=False`` replicates the reference's Combo.predict
    (models.py:1640: ``np.sum(X * weights, axis=1)`` — NO division by
    the weight sum), which matters when negative-weight replacement
    leaves the weights summing to something other than 1. The default
    keeps the safe normalized average for plain callers.
    """
    sub = results.filter(F.col(model_col).isin(models))
    if weights is None:
        wmap = {m: 1.0 for m in models}
    elif normalize:
        total = sum(weights)
        wmap = {m: w / total for m, w in zip(models, weights)}
    else:
        wmap = dict(zip(models, weights))
    wcol = F.coalesce(
        *[
            F.when(F.col(model_col) == m, F.lit(w))
            for m, w in wmap.items()
        ]
    ) if len(wmap) > 1 else F.lit(1.0)
    keys = [SERIES, DS] + (["kind"] if "kind" in results.columns else [])
    wsum = F.lit(1.0) if (weights is not None and not normalize) else F.sum("_w")
    return (
        sub.withColumn("_w", wcol)
        .groupBy(*keys)
        .agg(
            (F.sum(F.col(value_col) * F.col("_w")) / wsum).alias(value_col)
        )
    )


def derive_weights(
    scores: list[float],
    lower_is_better: bool = True,
    replace_negative_weights: bool | float = 0.001,
) -> list[float]:
    """Reference weight derivation, replicated EXACTLY (models.py
    Combo.fit, models.py:1604-1617):

        weights = [s / sum(scores) for s in scores]
        if lower_is_better: weights.reverse()
        elif replace_negative_weights is not False:
            weights = [replace if w < 0 else w for w in weights]

    ``scores`` must arrive in MODEL order. Note the reference's
    lower-is-better handling is a plain list REVERSAL (not an
    inversion) — it assigns the best model the largest share only when
    the models are already sorted best-first (the ``models='top_n'``
    path guarantees that); we keep the quirk verbatim for parity.
    Negative-score replacement is skipped for lower-is-better metrics
    (the reference's elif), and ``replace_negative_weights=False``
    turns it off entirely."""
    total = sum(scores)
    weights = [s / total for s in scores]
    if lower_is_better:
        weights.reverse()
    elif replace_negative_weights is not False:
        weights = [
            float(replace_negative_weights) if w < 0 else w for w in weights
        ]
    return weights
