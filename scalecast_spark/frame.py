"""TimeSeriesFrame — the engine's central data abstraction.

The reference keeps one univariate series per ``Forecaster`` object as a
pandas Series plus dicts of regressors (reference:
src/scalecast/Forecaster.py:44-94, _Forecaster_parent.py:45-67). Here the
same state is ONE long Spark DataFrame:

    (series_id STRING, ds TIMESTAMP, y DOUBLE, is_future INT, <feature>...)

Multi-series (the reference's MVForecaster, MVForecaster.py:34-174) is just
more distinct ``series_id`` values — the dict-of-series disappears, and
every operator scales horizontally across series via partitioned window
functions instead of Python loops.

Invariants preserved from the reference (SURVEY.md §1.4):
  * rows are keyed (series_id, ds); all ordered ops sort by ds in-window
  * future rows (the forecast horizon) carry is_future=1 and y NULL
  * test/validation slices are temporal suffixes — expressed as filters
    over the immutable frame, never copies (deepcopy elimination)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.functions.timegrain import epoch_seconds

SERIES = "series_id"
DS = "ds"
Y = "y"
IS_FUTURE = "is_future"

#: reserved (non-feature) column names
RESERVED = {SERIES, DS, Y, IS_FUTURE}


@dataclass(frozen=True)
class TimeSeriesFrame:
    """Immutable wrapper over the long-format DataFrame.

    ``freq_seconds`` is the modal spacing between observations (the
    reference's pandas-inferred ``freq``, Forecaster.py:324-335).
    """

    df: DataFrame
    freq_seconds: float | None = None
    #: ordered feature column names (the reference's current_xreg keys)
    features: tuple[str, ...] = field(default_factory=tuple)

    # -- construction -------------------------------------------------
    @classmethod
    def from_long(cls, df: DataFrame, infer_freq: bool = True) -> "TimeSeriesFrame":
        """Build from a (series_id, ds, y) DataFrame; NaN y rows dropped
        like the reference's _typ_set (Forecaster.py:343)."""
        cols = set(df.columns)
        missing = {SERIES, DS, Y} - cols
        if missing:
            raise ValueError(f"long frame requires columns {sorted(missing)}")
        out = df.withColumn(Y, F.col(Y).cast("double")).filter(
            F.col(Y).isNotNull() & ~F.isnan(Y)
        )
        if IS_FUTURE not in cols:
            out = out.withColumn(IS_FUTURE, F.lit(0))
        feats = tuple(c for c in df.columns if c not in RESERVED)
        # NOTE (optimization round 16): an ingest-level cache of `out`
        # (salted scratch entry filled by the infer_meta job below) was
        # implemented and measured REJECTED — min-of-3 interleaved A/B
        # at sf0.1: forecaster_ttf 2.98 → 3.39 s, ts_forecast_recursive
        # 1.30 → 1.44 s, ts_cv_grid/ts_metrics flat. The multi-job
        # consumers this would serve are already covered by
        # tune_test_forecast's duration-scoped cache (round 13), and
        # the kernel CV / fused test+full paths read the base exactly
        # once — so the fill cost buys no reuse.
        tsf = cls(df=out, features=feats)
        if infer_freq:
            freq, n_series, min_obs = tsf.infer_meta()
            tsf = replace(tsf, freq_seconds=freq)
            object.__setattr__(tsf, "_stats", (n_series, min_obs))
        return tsf

    def _carry_stats(self, new: "TimeSeriesFrame") -> "TimeSeriesFrame":
        """Propagate the cached (n_series, min_obs) pair onto a derived
        frame whose OBSERVED row set is provably unchanged (feature
        columns added/dropped, future horizon appended). Row-changing
        derivations (chops, transforms) simply don't call this — a
        plain ``replace`` never carries the attribute (it is not a
        dataclass field, by design), so staleness is impossible by
        default."""
        st = getattr(self, "_stats", None)
        if st is not None:
            object.__setattr__(new, "_stats", st)
        return new

    # -- metadata -----------------------------------------------------
    def infer_freq(self) -> float | None:
        """Modal gap between consecutive observations, in seconds.

        Reference: pd.infer_freq at Forecaster.py:324-335. Distributed
        version: lag-delta per series, global mode. One shuffle, tiny
        result — runs once at ingest.
        """
        w = W.partitionBy(SERIES).orderBy(DS)
        deltas = (
            self.df.filter(F.col(IS_FUTURE) == 0)
            .select(
                (
                    epoch_seconds(DS) - epoch_seconds(F.lag(DS).over(w))
                ).alias("delta")
            )
            .filter(F.col("delta").isNotNull())
            .groupBy("delta")
            .count()
            .orderBy(F.desc("count"), "delta")
            .limit(1)
            .collect()
        )
        return float(deltas[0]["delta"]) if deltas else None

    def infer_meta(self) -> tuple[float | None, int, int | None]:
        """``infer_freq`` + the series stats every tuning path needs —
        (freq_seconds, n_series, min_obs) — in ONE Spark job
        (optimization round 15: cross_validate previously re-collected
        the per-series counts as a second job at every call; guide
        §1.2 "don't compute things twice"). The two result arms share
        the lag-window subtree (same exchange — ReuseExchange), union
        into a 2-row collect; the freq arm keeps infer_freq's exact
        ordering rule (count desc, delta asc), so the inferred
        frequency is bit-identical to :meth:`infer_freq`."""
        w = W.partitionBy(SERIES).orderBy(DS)
        d = (
            self.df.filter(F.col(IS_FUTURE) == 0)
            .select(
                SERIES,
                (
                    epoch_seconds(DS) - epoch_seconds(F.lag(DS).over(w))
                ).alias("delta"),
            )
        )
        arm_freq = (
            d.filter(F.col("delta").isNotNull())
            .groupBy("delta")
            .count()
            .orderBy(F.desc("count"), "delta")
            .limit(1)
            .select(
                F.lit("freq").alias("_k"),
                F.col("delta").cast("double").alias("_freq"),
                F.lit(None).cast("long").alias("_min"),
                F.lit(None).cast("long").alias("_n"),
            )
        )
        arm_stats = (
            d.groupBy(SERIES)
            .count()
            .agg(F.min("count").alias("_min"), F.count("*").alias("_n"))
            .select(
                F.lit("stats").alias("_k"),
                F.lit(None).cast("double").alias("_freq"),
                F.col("_min").cast("long").alias("_min"),
                F.col("_n").cast("long").alias("_n"),
            )
        )
        rows = {r["_k"]: r for r in arm_freq.unionByName(arm_stats).collect()}
        freq = (
            float(rows["freq"]["_freq"]) if "freq" in rows else None
        )
        st = rows.get("stats")
        n_series = int(st["_n"]) if st is not None else 0
        min_obs = (
            int(st["_min"])
            if st is not None and st["_min"] is not None else None
        )
        return freq, n_series, min_obs

    @property
    def observed(self) -> DataFrame:
        return self.df.filter(F.col(IS_FUTURE) == 0)

    @property
    def future(self) -> DataFrame:
        return self.df.filter(F.col(IS_FUTURE) == 1)

    def series_ids(self) -> list[str]:
        return [r[0] for r in self.df.select(SERIES).distinct().collect()]

    # -- horizon ------------------------------------------------------
    def generate_future_dates(self, h: int) -> "TimeSeriesFrame":
        """Append h future rows per series at the inferred frequency.

        Reference: generate_future_dates (_Forecaster_parent.py:1317-1356)
        uses pd.date_range. Spark-first: per-series max(ds) (one small agg)
        + ``sequence()`` + explode — no driver loop, scales to millions of
        series.
        """
        if self.freq_seconds is None:
            raise ValueError("frequency unknown; cannot generate horizon")
        # float step: sub-second frequencies (tick data) must not
        # truncate to 0; timestamp_seconds(double) keeps microseconds
        step = float(self.freq_seconds)
        last = self.observed.groupBy(SERIES).agg(F.max(DS).alias("last_ds"))
        fut = (
            last.select(
                SERIES,
                F.explode(F.sequence(F.lit(1), F.lit(h))).alias("_i"),
                "last_ds",
            )
            .select(
                SERIES,
                F.timestamp_seconds(
                    epoch_seconds("last_ds") + F.col("_i") * step
                ).alias(DS),
                F.lit(None).cast("double").alias(Y),
                F.lit(1).alias(IS_FUTURE),
            )
        )
        base = self.df.filter(F.col(IS_FUTURE) == 0).select(SERIES, DS, Y, IS_FUTURE, *self.features)
        fut = fut.select(
            SERIES, DS, Y, IS_FUTURE,
            *[F.lit(None).cast("double").alias(c) for c in self.features],
        )
        # future rows carry is_future=1: the observed row set (what the
        # cached series stats describe) is unchanged
        return self._carry_stats(replace(self, df=base.unionByName(fut)))

    # -- slicing (SURVEY.md §2.4) -------------------------------------
    def chop_from_front(self, n: int) -> "TimeSeriesFrame":
        """Drop the last n observations of every series (the as-of rewind
        behind test/CV/backtest; reference Forecaster.py:1675-1702).
        Implemented as a rank filter over the immutable frame — the
        reference's deepcopy is eliminated entirely."""
        w = W.partitionBy(SERIES).orderBy(F.desc(DS))
        df = (
            self.observed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > n)
            .drop("_rn")
        )
        return replace(self, df=df)

    def chop_from_back(self, n: int) -> "TimeSeriesFrame":
        """Drop the first n observations (reference Forecaster.py:1704-1723)."""
        w = W.partitionBy(SERIES).orderBy(DS)
        df = (
            self.observed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > n)
            .drop("_rn")
        )
        return replace(self, df=df)

    def keep_smaller_history(self, n) -> "TimeSeriesFrame":
        """Keep only the last n observations per series, or — when
        ``n`` is a date/datetime/date-string — every observation at or
        after that cutoff (reference Forecaster.py:1725-1749 accepts
        both forms)."""
        import datetime as _dt

        if isinstance(n, (str, _dt.date, _dt.datetime)) or (
            not isinstance(n, int) and hasattr(n, "to_pydatetime")
        ):
            # Validate on the driver: an unparseable string would cast
            # to NULL inside the plan and silently empty the frame.
            import pandas as _pd

            try:
                cutoff = _pd.Timestamp(n)
            except (ValueError, TypeError) as exc:
                raise ValueError(
                    f"keep_smaller_history: {n!r} is not a parseable "
                    f"date cutoff"
                ) from exc
            if _pd.isna(cutoff):
                raise ValueError(
                    f"keep_smaller_history: {n!r} parsed to NaT"
                )
            df = self.observed.filter(
                F.col(DS) >= F.lit(cutoff.isoformat()).cast("timestamp")
            )
            return replace(self, df=df)
        w = W.partitionBy(SERIES).orderBy(F.desc(DS))
        df = (
            self.observed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn")
        )
        return replace(self, df=df)

    def with_features(self, df: DataFrame, new: list[str]) -> "TimeSeriesFrame":
        bad = [c for c in new if "." in c or "`" in c]
        if bad:
            # '.' parses as a struct path in F.col() and breaks every
            # downstream consumer of the feature
            raise ValueError(f"feature names must not contain '.' or '`': {bad}")
        feats = tuple(dict.fromkeys([*self.features, *new]))
        # feature derivations are row-preserving by contract (window
        # projections / left joins on the (series_id, ds) spine), so
        # the cached series stats stay valid
        return self._carry_stats(replace(self, df=df, features=feats))

    def drop_features(self, *names: str) -> "TimeSeriesFrame":
        """drop_Xvars (reference _Forecaster_parent.py:720-766)."""
        keep = tuple(c for c in self.features if c not in names)
        return self._carry_stats(
            replace(self, df=self.df.drop(*names), features=keep)
        )
