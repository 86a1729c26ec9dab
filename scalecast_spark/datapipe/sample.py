"""Deterministic sampling for reproducible dataset curation.

``sample(fraction, seed)`` in any engine draws from engine-specific
RNG state — re-running on a different cluster, partition layout, or
engine changes the sample. Training-data curation wants the OPPOSITE:
the sample is a pure function of the data, reproducible everywhere and
auditable row-by-row. The standard trick: keep a row iff the first 8
hex chars of md5(key ‖ salt) fall below rate · 2^32 — a uniform
deterministic draw per key, stable across engines (and therefore
hash-checkable against the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M32 = float(1 << 32)


def _bucket(key_col, salt: str) -> "F.Column":
    h = F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_M32)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep ~rate of rows, chosen by md5(key:salt) — the same rows
    survive on every engine, cluster size, and run. Pure scan-side
    filter: pushes to the source, no shuffle, no RNG state."""
    return df.filter(_bucket(F.col(key_col), salt) < rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample crawl dumps,
    keep all curated sources): rate = rates.get(stratum, default).
    Same scan-side filter shape — the rate map compiles to a CASE
    expression, so Catalyst still pushes the whole predicate down."""
    rate = F.lit(float(default_rate))
    expr = None
    for s, r in sorted(rates.items()):
        cond = F.col(stratum_col) == s
        expr = F.when(cond, float(r)) if expr is None else expr.when(cond, float(r))
    rate = expr.otherwise(float(default_rate)) if expr is not None else rate
    return df.filter(_bucket(F.col(key_col), salt) < rate)
