"""Time-aware joins (north-star surface; SURVEY.md §2.5).

The reference's date-alignment joins (xregs ingest, calendar spine,
signal joins) are exact equi-joins on ds; real pipelines also need the
AS-OF join — attach to each observation the MOST RECENT row of another
table at-or-before its timestamp (pandas merge_asof; DuckDB/kdb ASOF
JOIN). Spark has no native asof operator, and the naive theta-join
(``l.ts >= r.ts`` + per-row argmax) is a range join that degenerates
to O(|L|·|R|) per key at scale.

Spark-first restatement: UNION the two sides tagged, ONE window per
key ordered by (ts, side) with a nulls-ignoring ``last`` carrying the
right side's values forward, then keep the left rows — which travel
WHOLE through the union, so no id bookkeeping and no second join.
Cost = one hash shuffle on the key + one sort, the same physical
shape as a lag feature, no matter how large either side is.
Tolerance and the forward direction compose on the same pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T, Window as W

from scalecast_spark.functions.timegrain import epoch_seconds, interval_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ds",
    by: str | list[str] = "series_id",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For every ``left`` row, attach ``right``'s value columns from
    the latest right row with ``right.on <= left.on`` (direction
    'backward', inclusive — pandas merge_asof semantics) or the
    earliest with ``right.on >= left.on`` ('forward'), matching within
    the ``by`` key(s). Left rows with no match carry NULLs.

    ``tolerance`` voids matches further than that from the left
    timestamp (an interval string like ``'2 days'``, or a number of
    seconds) — pandas' ``tolerance``. ``value_cols`` defaults to every
    right column that is neither key nor timestamp; ``suffix`` renames
    the attached columns (collisions with left columns raise).

    ``allow_exact_matches=False`` excludes a right row exactly AT the
    left timestamp (strict < / >), pandas' flag of the same name.

    Scale shape: one hash shuffle on ``by`` + one sort over the union
    of both sides — never a range join, never per-row subqueries. Ties
    on ``on`` resolve right-row-first, so a right reading AT the left
    timestamp is visible to it (when exact matches are allowed);
    multiple right rows at one timestamp resolve to the LAST one in
    (arbitrary but deterministic-per-sort) order, like merge_asof's
    positional last."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward'; got {direction!r}"
        )
    keys = [by] if isinstance(by, str) else list(by)
    for k in keys + [on]:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"asof_join: column {k!r} must exist on both sides")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [on]]
    if not value_cols:
        raise ValueError("asof_join: right side has no value columns")
    out_vals = [c + suffix for c in value_cols]
    clash = [v for v in out_vals if v in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: attached column(s) {sorted(clash)} collide "
            f"with left columns; pass a suffix"
        )

    left_cols = list(left.columns)
    # left rows travel whole; right rows carry only key/ts/values with
    # NULLs for the left payload (dropped after the carry pass)
    l_tag = left.select(
        *left_cols,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(v)
          for c, v in zip(value_cols, out_vals)],
        F.lit(None).cast(right.schema[on].dataType).alias("_rts"),
    )
    r_tag = right.select(
        *[
            F.col(c).alias(c) if c in keys
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(v) for c, v in zip(value_cols, out_vals)],
        F.col(on).alias("_rts"),
    )
    combined = l_tag.unionByName(r_tag)
    # side ordering within a timestamp tie decides exact-match
    # visibility: right-first (asc on the 0/1 tag) makes an AT-ts
    # reading visible; left-first (desc) hides it — strict semantics
    side = F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
    order = (
        [F.col("_ts").asc(), side]
        if direction == "backward"
        else [F.col("_ts").desc(), side]
    )
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = combined.select(
        *left_cols, "_ts", "_side",
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in out_vals],
        F.last("_rts", ignorenulls=True).over(w).alias("_rts"),
    ).filter(F.col("_side") == 1)
    if tolerance is not None:
        # type-aware, sub-second-safe gap: fractional epoch seconds for
        # date/timestamp on-columns (microsecond precision — the old
        # unix_timestamp truncated to whole seconds, so ms-grain
        # tolerances passed/failed spuriously); the column's own units
        # for numeric on-columns (merge_asof parity — unix_timestamp on
        # a numeric returns NULL, silently voiding every match)
        l_sec = epoch_seconds("_ts", left.schema[on].dataType)
        r_sec = epoch_seconds("_rts", right.schema[on].dataType)
        gap = l_sec - r_sec if direction == "backward" else r_sec - l_sec
        if isinstance(tolerance, (int, float)):
            tol = F.lit(float(tolerance))
        else:
            if isinstance(left.schema[on].dataType, T.NumericType):
                raise ValueError(
                    "asof_join: an interval-string tolerance needs a "
                    f"date/timestamp on-column; {on!r} is numeric — pass "
                    "a number in the column's own units"
                )
            tol = interval_seconds(tolerance)
        keep = F.col("_rts").isNotNull() & (gap <= tol)
        carried = carried.select(
            *left_cols, "_ts", "_side",
            *[F.when(keep, F.col(v)).alias(v) for v in out_vals],
        )
    return carried.select(*left_cols, *out_vals)
