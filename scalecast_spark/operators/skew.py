"""Skew-resistant aggregation — the 100 TB safety valve for hot keys.

A groupBy on a power-law key (one bot user, one dominant event type)
funnels a whole key's rows through one reducer. ``salted_sum`` splits
each key into ``n_salts`` shards (two-stage aggregate: partial per
(key, salt) → final per key), bounding any single task at 1/n_salts of
the hot key. Semantics identical to a plain groupBy — verified against
the unsalted oracle.

AQE's skew-join handling covers JOINS automatically; this covers
AGGREGATIONS, which AQE does not re-shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: {col: fn} with fn ∈ {sum, count, min, max} (the
    decomposable aggregates; avg = sum/count by the caller).
    """
    salt = (F.crc32(F.concat_ws("", *keys)) + F.monotonically_increasing_id()) % n_salts
    partial_exprs = []
    final_exprs = []
    for c, fn in aggs.items():
        alias = f"{fn}_{c}"
        if fn == "sum":
            partial_exprs.append(F.sum(c).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        elif fn == "count":
            partial_exprs.append(F.count(c).alias(alias))
            final_exprs.append(F.sum(alias).cast("long").alias(alias))
        elif fn == "min":
            partial_exprs.append(F.min(c).alias(alias))
            final_exprs.append(F.min(alias).alias(alias))
        elif fn == "max":
            partial_exprs.append(F.max(c).alias(alias))
            final_exprs.append(F.max(alias).alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )
