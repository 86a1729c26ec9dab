"""Invertible series transforms (SURVEY.md §2.3).

The reference's SeriesTransformer (src/scalecast/SeriesTransformer.py:14-829)
rewrites ``f.y`` in place and stores whatever state the inverse needs on
``self``. Here every transform is an object that:

  * ``fit(df)`` computes per-series parameters as a SMALL DataFrame
    (series_id, params...) — one aggregate job, broadcast-joined back;
  * ``transform(df, col)`` / ``invert(df, col)`` are pure column
    expressions, so transforming y and later reverting forecasts /
    fitted values / CI bounds (SeriesTransformer.py:90-118's history
    rewrite) is the SAME code applied to a different column.

Because params live in a DataFrame keyed by series_id, one transform
object serves millions of series — the pandas original holds scalars for
exactly one.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y

_w = lambda: W.partitionBy(SERIES).orderBy(DS)  # noqa: E731


class Transform:
    """Base: stateless transforms override expr/inv_expr; stateful ones
    also override fit() to build a params frame."""

    params: DataFrame | None = None

    def fit(self, df: DataFrame, train_only_cutoff=None) -> "Transform":
        return self

    def _with_params(self, df: DataFrame) -> DataFrame:
        if self.params is None:
            return df
        return df.join(F.broadcast(self.params), on=SERIES, how="left")

    def expr(self, col):  # pragma: no cover - abstract
        raise NotImplementedError

    def inv_expr(self, col):  # pragma: no cover - abstract
        raise NotImplementedError

    def transform(self, df: DataFrame, col: str = Y) -> DataFrame:
        out = self._with_params(df).withColumn(col, self.expr(F.col(col)))
        return out.drop(*self._param_cols())

    def invert(self, df: DataFrame, *cols: str) -> DataFrame:
        out = self._with_params(df)
        for c in cols:
            if c in df.columns:
                out = out.withColumn(c, self.inv_expr(F.col(c)))
        return out.drop(*self._param_cols())

    def _param_cols(self) -> list[str]:
        return [] if self.params is None else [c for c in self.params.columns if c != SERIES]


class LogTransform(Transform):
    """ln / exp (reference SeriesTransformer.py:313-345)."""

    def expr(self, col):
        return F.log(col)

    def inv_expr(self, col):
        return F.exp(col)


class SqrtTransform(Transform):
    """sqrt / square (reference SeriesTransformer.py:347-379)."""

    def expr(self, col):
        return F.sqrt(col)

    def inv_expr(self, col):
        return F.pow(col, 2.0)


class BoxCoxTransform(Transform):
    """Box-Cox with fixed lambda (reference _utils.py:75-87)."""

    def __init__(self, lmbda: float):
        self.lmbda = lmbda

    def expr(self, col):
        if self.lmbda == 0:
            return F.log(col)
        return (F.pow(col, self.lmbda) - 1.0) / self.lmbda

    def inv_expr(self, col):
        if self.lmbda == 0:
            return F.exp(col)
        return F.pow(col * self.lmbda + 1.0, 1.0 / self.lmbda)


@dataclass
class ScaleTransform(Transform):
    """(y - mean) / stddev_pop per series (reference
    SeriesTransformer.py:381-441; train_only via cutoff filter)."""

    params: DataFrame | None = None

    def fit(self, df: DataFrame, train_only_cutoff=None):
        src = df.filter(F.col(IS_FUTURE) == 0)
        if train_only_cutoff is not None:
            src = src.filter(F.col(DS) <= F.lit(train_only_cutoff))
        self.params = src.groupBy(SERIES).agg(
            F.avg(Y).alias("_mu"), F.stddev_pop(Y).alias("_sigma")
        )
        return self

    def expr(self, col):
        return F.try_divide(col - F.col("_mu"), F.col("_sigma"))

    def inv_expr(self, col):
        return col * F.col("_sigma") + F.col("_mu")


@dataclass
class MinMaxTransform(Transform):
    """(y - min) / (max - min) (reference SeriesTransformer.py:498-558)."""

    params: DataFrame | None = None

    def fit(self, df: DataFrame, train_only_cutoff=None):
        src = df.filter(F.col(IS_FUTURE) == 0)
        if train_only_cutoff is not None:
            src = src.filter(F.col(DS) <= F.lit(train_only_cutoff))
        self.params = src.groupBy(SERIES).agg(
            F.min(Y).alias("_lo"), F.max(Y).alias("_hi")
        )
        return self

    def expr(self, col):
        return F.try_divide(col - F.col("_lo"), F.col("_hi") - F.col("_lo"))

    def inv_expr(self, col):
        return col * (F.col("_hi") - F.col("_lo")) + F.col("_lo")


@dataclass
class RobustScaleTransform(Transform):
    """(y - median) / IQR via exact percentiles (reference
    SeriesTransformer.py:443-496 wraps sklearn RobustScaler). Exact
    ``percentile`` (not approx) to match numpy's linear interpolation —
    SURVEY.md §4.3 watchpoint."""

    params: DataFrame | None = None

    def fit(self, df: DataFrame, train_only_cutoff=None):
        src = df.filter(F.col(IS_FUTURE) == 0)
        if train_only_cutoff is not None:
            src = src.filter(F.col(DS) <= F.lit(train_only_cutoff))
        self.params = src.groupBy(SERIES).agg(
            F.expr(f"percentile({Y}, 0.5)").alias("_med"),
            (
                F.expr(f"percentile({Y}, 0.75)") - F.expr(f"percentile({Y}, 0.25)")
            ).alias("_iqr"),
        )
        return self

    def expr(self, col):
        return F.try_divide(col - F.col("_med"), F.col("_iqr"))

    def inv_expr(self, col):
        return col * F.col("_iqr") + F.col("_med")


@dataclass
class DetrendTransform(Transform):
    """Subtract a per-series trend (reference SeriesTransformer.py:121-311):

      * ``poly_order=1`` (default) — closed-form ``regr_slope``/
        ``regr_intercept`` aggregates: one pass, fully distributed.
      * ``poly_order>=2`` — normal equations over NORMALIZED time
        (tn ∈ [-1, 1] for conditioning): distributed moment aggregate,
        then a tiny per-series solve via mapInPandas on the one-row-
        per-series moment frame. Trend re-materializes from row_number,
        so future rows extrapolate the polynomial.
      * ``loess=True`` — per-series LOESS smooth (applyInPandas kernel,
        functions/smooth.py); future rows extrapolate linearly from the
        boundary slope, matching the reference's fcst-trend behavior.
      * ``ln_trend`` / ``seasonal_lags`` / ``fit_intercept=False`` —
        the reference's general OLS trend (SeriesTransformer.py:186-211:
        log every time regressor, add lagged time trends at multiples
        of ``m``, optional no-constant fit). Runs as one distributed
        Gram-moment aggregate + a per-series driver-free solve on the
        one-row-per-series moment frame; rows before the last seasonal
        lag starts (t <= seasonal_lags*m) drop from the series exactly
        like the reference's dropna + keep_smaller_history.
    """

    poly_order: int = 1
    loess: bool = False
    frac: float = 0.3
    #: LOESS robustness iterations (statsmodels lowess ``it=``);
    #: 0 = the hash-certified plain pass (gate member default)
    it: int = 0
    ln_trend: bool = False
    seasonal_lags: int = 0
    m: int | str = "auto"
    fit_intercept: bool = True
    params: DataFrame | None = None
    trend_frame: DataFrame | None = None
    t_frame: DataFrame | None = None

    @property
    def _design_mode(self) -> bool:
        return not self.loess and (
            self.ln_trend or self.seasonal_lags > 0 or not self.fit_intercept
        )

    def fit(self, df: DataFrame, train_only_cutoff=None):
        w = _w()
        src = df.withColumn("_t", F.row_number().over(w).cast("double")).filter(
            F.col(IS_FUTURE) == 0
        )
        if train_only_cutoff is not None:
            src = src.filter(F.col(DS) <= F.lit(train_only_cutoff))
        # the fit-time time index keyed BY DATE: invert must
        # re-materialize the SAME trend even when a stacked transform
        # (Diff) later drops prefix rows — a bare row_number over the
        # shortened frame would shift the whole trend by the number of
        # dropped rows (r13 review finding). Rows beyond the fit range
        # continue the index from the last fitted t.
        self.t_frame = src.select(SERIES, DS, "_t")
        if self.loess:
            return self._fit_loess(src)
        if self._design_mode:
            if self.seasonal_lags > 0:
                from scalecast_spark.functions.seasonal import resolve_m

                self.m = resolve_m(self.m, src)
            return self._fit_design(src)
        if self.poly_order == 1:
            self.params = src.groupBy(SERIES).agg(
                F.expr(f"regr_slope({Y}, _t)").alias("_slope"),
                F.expr(f"regr_intercept({Y}, _t)").alias("_icept"),
            )
            return self
        return self._fit_poly(src)

    # ------------------------------------------------- poly >= 2
    def _fit_poly(self, src: DataFrame):
        import pandas as pd
        from pyspark.sql import types as T

        p = self.poly_order
        n_per = src.groupBy(SERIES).agg(F.max("_t").alias("_n"))
        with_tn = src.join(F.broadcast(n_per), SERIES).withColumn(
            "_tn",
            F.when(F.col("_n") > 1,
                   (2.0 * F.col("_t") - (F.col("_n") + 1.0)) / (F.col("_n") - 1.0)
                   ).otherwise(F.lit(0.0)),
        )
        aggs = [F.count("*").cast("double").alias("_s0")]
        aggs += [F.sum(F.pow("_tn", k)).alias(f"_s{k}") for k in range(1, 2 * p + 1)]
        aggs += [F.sum(F.col(Y) * F.pow("_tn", k)).alias(f"_m{k}") for k in range(0, p + 1)]
        aggs += [F.max("_n").alias("_n")]
        moments = with_tn.groupBy(SERIES).agg(*aggs)
        schema = T.StructType(
            [moments.schema[SERIES]]
            + [T.StructField("_n", T.DoubleType())]
            + [T.StructField(f"_c{k}", T.DoubleType()) for k in range(p + 1)]
        )

        def solve(it):
            import numpy as np

            for pdf in it:
                rows = []
                for _, r in pdf.iterrows():
                    A = np.array(
                        [[r[f"_s{i + j}"] if i + j else r["_s0"] for j in range(p + 1)]
                         for i in range(p + 1)]
                    )
                    b = np.array([r[f"_m{k}"] for k in range(p + 1)])
                    try:
                        c = np.linalg.solve(A, b)
                    except np.linalg.LinAlgError:
                        c = np.zeros(p + 1)
                        c[0] = r["_m0"] / r["_s0"] if r["_s0"] else 0.0
                    rows.append(
                        [r[SERIES], r["_n"]] + [float(v) for v in c]
                    )
                yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

        self.params = moments.mapInPandas(solve, schema)
        return self

    # ------------------------------------------- general design
    def _design_exprs(self, t) -> list:
        """The trend regressors as column expressions of the time index
        ``t`` (reference SeriesTransformer.py:186-211): the time trend
        plus a lagged copy per seasonal lag (tlag_{j*m} = t - j*m, NULL
        before it starts), each optionally logged, each raised to the
        powers 1..poly_order (add_poly_terms keeps the originals)."""
        bases = [t] + [
            t - float(j * self.m) for j in range(1, self.seasonal_lags + 1)
        ]
        cols = []
        for b in bases:
            vb = F.when(b >= 1.0, b)  # pre-lag rows → NULL (ref dropna)
            if self.ln_trend:
                vb = F.log(vb)
            for k in range(1, self.poly_order + 1):
                cols.append(F.pow(vb, float(k)) if k > 1 else vb)
        return cols

    def _fit_design(self, src: DataFrame):
        import pandas as pd
        from pyspark.sql import types as T

        xcols = self._design_exprs(F.col("_t").cast("double"))
        if self.fit_intercept:
            xcols = [F.lit(1.0)] + xcols
        d = len(xcols)
        rows_ok = src
        for i, x in enumerate(xcols):
            rows_ok = rows_ok.withColumn(f"_x{i}", x)
        # reference drops rows where any lagged regressor is NaN
        rows_ok = rows_ok.na.drop(subset=[f"_x{i}" for i in range(d)])
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum(F.col(f"_x{i}") * F.col(f"_x{j}")).alias(f"_g{i}_{j}")
                )
            aggs.append(F.sum(F.col(f"_x{i}") * F.col(Y)).alias(f"_h{i}"))
            aggs.append(F.max(F.abs(F.col(f"_x{i}"))).alias(f"_s{i}"))
        moments = rows_ok.groupBy(SERIES).agg(*aggs)
        schema = T.StructType(
            [moments.schema[SERIES]]
            + [T.StructField(f"_d{i}", T.DoubleType()) for i in range(d)]
        )

        def solve(it):
            import numpy as np

            for pdf in it:
                rows = []
                for _, r in pdf.iterrows():
                    A = np.empty((d, d))
                    for i in range(d):
                        for j in range(i, d):
                            A[i, j] = A[j, i] = r[f"_g{i}_{j}"]
                    b = np.array([r[f"_h{i}"] for i in range(d)])
                    # column scaling keeps the Gram matrix conditioned
                    # for raw t powers; lstsq (SVD pinv) matches the
                    # reference's statsmodels pinv on collinear lags
                    s = np.array(
                        [r[f"_s{i}"] if r[f"_s{i}"] else 1.0 for i in range(d)]
                    )
                    As = A / np.outer(s, s)
                    bs = b / s
                    c = np.linalg.lstsq(As, bs, rcond=None)[0] / s
                    rows.append([r[SERIES]] + [float(v) for v in c])
                yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

        self.params = moments.mapInPandas(solve, schema)
        return self

    def _design_trend(self, out: DataFrame) -> DataFrame:
        t = F.col("_teff")
        xcols = self._design_exprs(t)
        off = 0
        trend = F.lit(0.0)
        if self.fit_intercept:
            trend = F.col("_d0")
            off = 1
        for i, x in enumerate(xcols):
            trend = trend + F.col(f"_d{i + off}") * x
        return out.withColumn("_trend", trend).drop("_teff")

    # ---------------------------------------------------- loess
    def _fit_loess(self, src: DataFrame):
        import pandas as pd
        from pyspark.sql import types as T

        from scalecast_spark.functions.smooth import loess_robust

        frac = self.frac
        it = self.it
        tschema = T.StructType(
            [src.schema[SERIES], src.schema[DS],
             T.StructField("_ltrend", T.DoubleType())]
        )

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values(DS)
            tr = loess_robust(
                np.arange(1.0, len(pdf) + 1.0), pdf[Y].to_numpy(float),
                frac, it=it,
            )
            return pd.DataFrame(
                {SERIES: pdf[SERIES], DS: pdf[DS], "_ltrend": tr}
            )

        self.trend_frame = (
            src.select(SERIES, DS, Y).groupBy(SERIES).applyInPandas(run, tschema)
        ).cache()
        w2 = W.partitionBy(SERIES).orderBy(F.desc(DS))
        last2 = (
            self.trend_frame.withColumn("_rev", F.row_number().over(w2))
            .filter(F.col("_rev") <= 2)
        )
        self.params = (
            last2.groupBy(SERIES).agg(
                F.max(F.when(F.col("_rev") == 1, F.col("_ltrend"))).alias("_last"),
                F.max(F.when(F.col("_rev") == 2, F.col("_ltrend"))).alias("_prev"),
                F.count("*").alias("_k"),
            )
            .join(
                self.trend_frame.groupBy(SERIES).agg(F.count("*").alias("_n")),
                SERIES,
            )
            .select(
                SERIES, "_n", F.col("_last").alias("_lastt"),
                F.coalesce(F.col("_last") - F.col("_prev"), F.lit(0.0)).alias("_bslope"),
            )
        )
        return self

    def _t_eff(self, df: DataFrame) -> DataFrame:
        """Attach ``_teff`` — the fit-time time index for every row:
        fitted dates join their stored t (immune to prefix rows
        dropped by stacked transforms); rows beyond the fit range
        continue from the last fitted t in date order."""
        out = df.join(self.t_frame, [SERIES, DS], "left")
        w_all = W.partitionBy(SERIES)
        w_cum = W.partitionBy(SERIES).orderBy(DS).rowsBetween(
            W.unboundedPreceding, 0
        )
        maxt = F.max("_t").over(w_all)
        k = F.sum(
            F.when(F.col("_t").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).over(w_cum)
        return out.withColumn(
            "_teff", F.coalesce(F.col("_t"), maxt + k)
        ).drop("_t")

    def _trended(self, df: DataFrame) -> DataFrame:
        t = F.col("_teff")
        if self.loess:
            out = (
                self._t_eff(df)
                .join(self.trend_frame, [SERIES, DS], "left")
                .join(F.broadcast(self.params), SERIES, "left")
                .withColumn(
                    "_trend",
                    F.coalesce(
                        F.col("_ltrend"),
                        F.col("_lastt") + F.col("_bslope") * (t - F.col("_n")),
                    ),
                )
            )
            return out.drop("_ltrend", "_teff")
        if self._design_mode:
            return self._design_trend(self._with_params(self._t_eff(df)))
        if self.poly_order == 1:
            return self._with_params(self._t_eff(df)).withColumn(
                "_trend", F.col("_icept") + F.col("_slope") * t
            ).drop("_teff")
        p = self.poly_order
        out = self._with_params(self._t_eff(df)).withColumn(
            "_tn",
            F.when(F.col("_n") > 1,
                   (2.0 * t - (F.col("_n") + 1.0)) / (F.col("_n") - 1.0)
                   ).otherwise(F.lit(0.0)),
        )
        trend = F.col("_c0")
        for k in range(1, p + 1):
            trend = trend + F.col(f"_c{k}") * F.pow("_tn", k)
        return out.withColumn("_trend", trend).drop("_tn", "_teff")

    def transform(self, df: DataFrame, col: str = Y) -> DataFrame:
        out = self._trended(df).withColumn(col, F.col(col) - F.col("_trend"))
        if self.seasonal_lags > 0:
            # pre-lag rows have a NULL trend and leave the series, like
            # the reference's keep_smaller_history(len(train_set))
            out = out.filter(F.col(col).isNotNull() | (F.col(IS_FUTURE) == 1))
        return out.drop("_trend", *self._param_cols())

    def invert(self, df: DataFrame, *cols: str) -> DataFrame:
        out = self._trended(df)
        for c in cols:
            if c in df.columns:
                out = out.withColumn(c, F.col(c) + F.col("_trend"))
        return out.drop("_trend", *self._param_cols())


@dataclass
class DeseasonTransform(Transform):
    """Subtract per-(series, season-phase) mean (additive decomposition;
    reference SeriesTransformer.py:700-829 wraps statsmodels
    seasonal_decompose). Phase = row_number mod m, so it works for any
    frequency; the seasonal profile continues onto future rows naturally
    (the reference needs an internal seasonal-naive forecast for that).

    ``m='auto'`` (the default since round 6) resolves the season length
    from the frame's modal gap at fit time via the reference's
    freq->length table (util.py:58-83 — functions/seasonal.py): daily
    data deseasons at 7, monthly at 12, weekly at 52, hourly at 24 —
    instead of the old hard-coded 12, which silently mis-phased any
    non-monthly series.
    """

    m: int | str = "auto"
    params: DataFrame | None = None

    def __init__(self, m: int | str = "auto"):
        self.m = m
        self.params = None

    def _phased(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_phase", (F.row_number().over(_w()) - 1) % self.m
        )

    def fit(self, df: DataFrame, train_only_cutoff=None):
        from scalecast_spark.functions.seasonal import resolve_m

        self.m = resolve_m(self.m, df)
        src = self._phased(df).filter(F.col(IS_FUTURE) == 0)
        if train_only_cutoff is not None:
            src = src.filter(F.col(DS) <= F.lit(train_only_cutoff))
        overall = src.groupBy(SERIES).agg(F.avg(Y).alias("_gmean"))
        self.params = (
            src.groupBy(SERIES, "_phase")
            .agg(F.avg(Y).alias("_pmean"))
            .join(overall, SERIES)
            .select(SERIES, "_phase", (F.col("_pmean") - F.col("_gmean")).alias("_seas"))
        )
        return self

    def _with_seas(self, df: DataFrame) -> DataFrame:
        return self._phased(df).join(
            F.broadcast(self.params), on=[SERIES, "_phase"], how="left"
        )

    def transform(self, df: DataFrame, col: str = Y) -> DataFrame:
        out = self._with_seas(df).withColumn(col, F.col(col) - F.col("_seas"))
        return out.drop("_phase", "_seas")

    def invert(self, df: DataFrame, *cols: str) -> DataFrame:
        out = self._with_seas(df)
        for c in cols:
            if c in df.columns:
                out = out.withColumn(c, F.col(c) + F.col("_seas"))
        return out.drop("_phase", "_seas")


@dataclass
class DiffTransform(Transform):
    """m-step differencing y_t - y_{t-m}; stackable (reference
    SeriesTransformer.py:560-698).

    Revert is the hard inverse (SURVEY.md §7.4 #2). The fit stores the
    pre-transform OBSERVED series keyed by (series, ds) — the moral
    equivalent of the reference's ``orig_y_{m}_{n}`` attribute snapshots
    (SeriesTransformer.py:604-652) — in two shapes:

      * ``anchors``: the fit-time level y_{t-m} re-keyed to ds_t, so an
        observed row reverts one-step (fitted-vals semantics) by a plain
        (series, ds) join, immune to prefix rows dropped by stacked
        transforms;
      * ``levels``: the fit-time levels at their own ds, seeding the
        recursive reconstruction of future rows.

    Future rows revert CUMULATIVELY (forecast semantics, no peeking at
    actuals past the frame's observed boundary): within the residue
    class (series, row mod m), level = last frame-observed actual level
    + running sum of predicted diffs — a window running-sum partitioned
    by (series, phase), fully distributed, no applyInPandas.

    Assumes per-series ds-contiguous rows (suffix/prefix trims are fine;
    arbitrary interior filters are not), which all engine flows satisfy.
    """

    m: int = 1
    anchors: DataFrame | None = None
    levels: DataFrame | None = None

    def __init__(self, m: int = 1):
        self.m = m
        self.anchors = None
        self.levels = None

    def fit(self, df: DataFrame, train_only_cutoff=None):
        w = _w()
        obs = df.filter(F.col(IS_FUTURE) == 0)
        self.levels = obs.select(SERIES, DS, F.col(Y).alias("_orig"))
        self.anchors = obs.select(
            SERIES,
            F.lead(DS, self.m).over(w).alias(DS),
            F.col(Y).alias("_anchor"),
        ).filter(F.col(DS).isNotNull())
        return self

    def transform(self, df: DataFrame, col: str = Y) -> DataFrame:
        w = _w()
        out = df.withColumn(col, F.col(col) - F.lag(col, self.m).over(w))
        # the first m rows of each series become NULL and drop out,
        # matching the reference's dropna after .diff(m)
        return out.filter(F.col(col).isNotNull() | (F.col(IS_FUTURE) == 1))

    def invert(self, df: DataFrame, *cols: str) -> DataFrame:
        out = (
            df.join(self.anchors, on=[SERIES, DS], how="left")
            .join(self.levels, on=[SERIES, DS], how="left")
            .withColumn("_phase", (F.row_number().over(_w()) - 1) % self.m)
        )
        wc = W.partitionBy(SERIES, "_phase").orderBy(DS).rowsBetween(
            W.unboundedPreceding, 0
        )
        # last actual level in this residue class at/before the row; for
        # the first future row in a class the previous class member IS
        # t-m (class rows are spaced exactly m apart)
        anchor_cls = F.last(
            F.when(F.col(IS_FUTURE) == 0, F.col("_orig")), ignorenulls=True
        ).over(wc)
        for c in cols:
            if c in df.columns:
                cum_fut = F.sum(
                    F.when(F.col(IS_FUTURE) == 1, F.col(c))
                ).over(wc)
                out = out.withColumn(
                    c,
                    F.when(F.col(IS_FUTURE) == 0, F.col(c) + F.col("_anchor"))
                    .otherwise(anchor_cls + cum_fut),
                )
        return out.drop("_anchor", "_orig", "_phase")


class Pipeline:
    """Ordered transform stack with revert in reverse order (the
    reference's Transformer/Reverter pair, Pipeline.py:11-214)."""

    def __init__(self, steps: list[Transform]):
        self.steps = steps

    def fit_transform(self, df: DataFrame, col: str = Y) -> DataFrame:
        for s in self.steps:
            s.fit(df)
            df = s.transform(df, col)
        return df

    def invert(self, df: DataFrame, *cols: str) -> DataFrame:
        for s in reversed(self.steps):
            df = s.invert(df, *cols)
        return df
