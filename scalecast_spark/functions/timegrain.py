"""Sub-second-safe time arithmetic.

The reference operates on a pandas DatetimeIndex, which degrades to
NANOSECOND resolution when the data does (SURVEY.md §1.2 — tick data,
logs). Spark's ``unix_timestamp()`` truncates to WHOLE seconds, so any
gap / tolerance / interpolation-weight computed with it is silently
wrong at sub-second grain (zero-length gaps, spurious tolerance
passes). ``epoch_seconds`` is the engine-wide replacement: a cast
chain that preserves Spark's full microsecond timestamp precision as
fractional epoch seconds, and passes numeric columns through in their
own units (pandas ``merge_asof`` accepts numeric ``on`` columns too).

Pure column expressions — no shuffles, no driver work, stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T


def epoch_seconds(col: str | Column, dtype: T.DataType | None = None) -> Column:
    """Fractional epoch seconds (microsecond precision) for a
    date/timestamp column; the value itself (cast double) for a
    numeric column.

    When ``dtype`` is known, numeric columns skip the timestamp round
    trip entirely — a bigint of nanosecond epochs would overflow the
    microsecond-backed timestamp type. Without ``dtype`` the cast
    chain ``-> timestamp -> double`` handles date, timestamp,
    timestamp_ntz and ISO strings alike (timestamp -> timestamp is a
    no-op; date gains 00:00:00 in the session zone, matching
    ``unix_timestamp``'s convention for whole days).
    """
    c = F.col(col) if isinstance(col, str) else col
    if dtype is not None and isinstance(dtype, T.NumericType):
        return c.cast("double")
    return c.cast("timestamp").cast("double")


def interval_seconds(interval: str) -> Column:
    """Fractional seconds in an interval literal like ``'2 days'`` or
    ``'500 milliseconds'`` — the sub-second-safe twin of the old
    ``unix_timestamp(epoch + INTERVAL x)`` trick, which truncated
    anything under one second to 0."""
    return F.expr(
        f"cast(timestamp '1970-01-01 00:00:00' + INTERVAL {interval} as double)"
        f" - cast(timestamp '1970-01-01 00:00:00' as double)"
    )
