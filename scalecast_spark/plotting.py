"""Plot surface — the reference's presentation tier, split into
distributed DATA and gated RENDER.

Reference: ``Forecaster.plot`` / ``plot_test_set`` / ``plot_fitted``
(Forecaster.py:1790-2063) and ``plot_acf`` / ``plot_pacf`` /
``plot_periodogram`` (Forecaster.py:1320-1392). Those draw directly
from in-memory numpy arrays; here every ``*_frame`` function computes
its plot-ready payload as ONE Spark plan (per-series-parallel, so a
million-series Forecaster pays the same number of jobs as one), and
matplotlib is an import-gated optional: absent — the frame IS the
product (notebooks/BI read it); present — :func:`render_lines` draws
the classic overlay chart from the same frame.

Scale notes:
  * ACF is a single window projection (demean + nlags lag columns)
    feeding one groupBy — the window's hash partitioning on series_id
    is reused by the aggregate, so the whole statistic costs one
    shuffle regardless of nlags.
  * PACF runs Durbin-Levinson per series over the (nlags+1)-row ACF
    groups via applyInPandas — microscopic per task, never on the
    driver.
  * render_lines draws what it plots: callers pass the already-reduced
    frame; the only driver materialization is the pixels' worth of
    rows.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T, Window as W

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y


def _observed(df: DataFrame) -> DataFrame:
    """Restrict to observed rows when the frame carries the
    is_future marker (plot inputs may be raw long frames)."""
    if IS_FUTURE in df.columns:
        return df.filter(F.col(IS_FUTURE) == 0)
    return df


def _prep_series(
    df: DataFrame,
    diffy: bool = False,
    train_only: bool = False,
    test_length: int = 0,
) -> DataFrame:
    """Shared preprocessing for the correlogram family (reference
    plot_acf/plot_pacf ``diffy``/``train_only`` switches,
    Forecaster.py:1320-1367): observed rows, optional first
    difference, optional test-tail chop."""
    out = _observed(df).select(SERIES, DS, Y)
    if train_only and test_length:
        wrev = W.partitionBy(SERIES).orderBy(F.desc(DS))
        out = (
            out.withColumn("_rev", F.row_number().over(wrev))
            .filter(F.col("_rev") > test_length)
            .drop("_rev")
        )
    if diffy:
        w = W.partitionBy(SERIES).orderBy(DS)
        out = (
            out.withColumn(Y, F.col(Y) - F.lag(Y).over(w))
            .filter(F.col(Y).isNotNull())
        )
    return out


def acf_frame(
    df: DataFrame,
    nlags: int = 24,
    diffy: bool = False,
    train_only: bool = False,
    test_length: int = 0,
    alpha: float | None = None,
) -> DataFrame:
    """Autocorrelation function per series, lags 0..nlags (reference
    plot_acf -> statsmodels acf, Forecaster.py:1320-1343): the biased
    estimator rho_k = sum_{t>k}((y_t-m)(y_{t-k}-m)) / sum((y_t-m)^2)
    with m the full-series mean — statsmodels' default (adjusted=False).

    One window projection (mean + nlags lag columns) into one
    aggregate; the stack() unpivot is a pure projection. Output:
    (series_id, lag, acf) rounded to 6dp. With ``alpha`` set, adds a
    ``conf`` half-width column via Bartlett's formula (statsmodels
    bartlett_confint=True): se(rho_k)^2 = (1 + 2*sum_{j<k} rho_j^2)/n,
    se(rho_1)^2 = 1/n, conf = z_{1-alpha/2} * se — a window cumsum
    over the already-tiny per-series lag rows, no extra shuffle of
    the data itself.
    """
    if nlags < 1:
        raise ValueError(f"nlags must be >= 1, got {nlags}")
    base = _prep_series(df, diffy, train_only, test_length)
    wfull = W.partitionBy(SERIES)
    w = W.partitionBy(SERIES).orderBy(DS)
    proj = base.select(
        SERIES,
        (F.col(Y) - F.avg(Y).over(wfull)).alias("dy"),
        DS,
    )
    proj = proj.select(
        SERIES,
        "dy",
        *[F.lag("dy", k).over(w).alias(f"dy_{k}") for k in range(1, nlags + 1)],
    )
    agg = proj.groupBy(SERIES).agg(
        F.count("dy").cast("double").alias("n"),
        F.sum(F.col("dy") * F.col("dy")).alias("c0"),
        *[
            F.sum(F.col("dy") * F.col(f"dy_{k}")).alias(f"c{k}")
            for k in range(1, nlags + 1)
        ],
    )
    pairs = ", ".join(f"{k}, c{k}" for k in range(1, nlags + 1))
    out = agg.select(
        SERIES,
        F.expr(f"stack({nlags}, {pairs}) as (lag, ck)"),
        "c0",
        "n",
    ).select(
        SERIES,
        F.col("lag").cast("int").alias("lag"),
        # try_divide: a constant series has c0=0 and an UNDEFINED acf —
        # NULL rows for that series, not an ANSI DIVIDE_BY_ZERO that
        # kills the whole job (one degenerate series among millions
        # must not fail the query)
        F.round(F.try_divide(F.col("ck"), F.col("c0")), 6).alias("acf"),
        "n",
    ).unionByName(
        agg.select(
            SERIES,
            F.lit(0).alias("lag"),
            F.when(F.col("c0") == 0, F.lit(None).cast("double"))
            .otherwise(F.lit(1.0))
            .alias("acf"),
            "n",
        )
    )
    if alpha is not None:
        from scalecast_spark.functions.normal import norm_ppf

        z = norm_ppf(1.0 - alpha / 2.0)
        wlag = (
            W.partitionBy(SERIES)
            .orderBy("lag")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        # Bartlett cumsum: rho_0^2 enters the window sum for every
        # k>=1 contributing the constant 1; subtract it back so lag 1
        # gets se^2 = 1/n and lag k gets (1 + 2*sum_{1<=j<k} rho_j^2)/n
        out = out.withColumn(
            "conf",
            F.when(F.col("lag") == 0, F.lit(0.0)).otherwise(
                F.round(
                    F.lit(z)
                    * F.sqrt(
                        (
                            F.lit(1.0)
                            + F.lit(2.0)
                            * (
                                F.sum(F.col("acf") * F.col("acf")).over(wlag)
                                - F.lit(1.0)
                            )
                        )
                        / F.col("n")
                    ),
                    6,
                )
            ),
        )
    return out.drop("n").orderBy(SERIES, "lag")


def pacf_frame(
    df: DataFrame,
    nlags: int = 24,
    diffy: bool = False,
    train_only: bool = False,
    test_length: int = 0,
    alpha: float | None = None,
    acf: DataFrame | None = None,
) -> DataFrame:
    """Partial autocorrelation per series, lags 0..nlags (reference
    plot_pacf -> statsmodels pacf, Forecaster.py:1344-1367), via the
    Durbin-Levinson recursion on the ACF vector — the 'ldb' (biased
    Levinson-Durbin) method.

    The recursion is inherently sequential in lag but only ever sees
    nlags+1 floats, so it runs per series inside applyInPandas over
    the tiny ACF frame — distributed across series, microscopic per
    task. Output: (series_id, lag, pacf) rounded to 6dp.

    ``acf`` takes a precomputed :func:`acf_frame` output (columns
    series_id, lag, acf for lags 0..nlags) so a caller that also
    needs the ACF — the correlogram family query, plot_acf+plot_pacf
    together — pays the corpus scan + window aggregate ONCE
    (localCheckpoint the shared frame; Spark does no subplan CSE
    across union branches). The other preprocessing switches are
    ignored when ``acf`` is given — which is why ``alpha`` is
    rejected in that mode: the confidence band's n comes from the
    raw series after those same preprocessing switches, so it could
    silently disagree with however the supplied acf was prepared
    (and with df=None it would crash outright).
    """
    if acf is not None and alpha is not None:
        raise ValueError(
            "pacf_frame: 'alpha' cannot be combined with a precomputed "
            "'acf' frame — the band's sample size n is derived from the "
            "raw series, which is not available / not guaranteed to match "
            "the supplied acf's preprocessing. Compute the band via "
            "pacf_frame(df, ..., alpha=...) or join one from acf_frame's "
            "conf column."
        )
    acf = (
        acf
        if acf is not None
        else acf_frame(df, nlags, diffy, train_only, test_length)
    )
    out_schema = T.StructType(
        [
            T.StructField(SERIES, acf.schema[SERIES].dataType),
            T.StructField("lag", T.IntegerType()),
            T.StructField("pacf", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lag")
        rho = pdf["acf"].to_numpy(float)
        n = len(rho) - 1
        if np.isnan(rho).any():
            # zero-variance series: acf_frame NULLs every lag (the
            # try_divide / c0=0 convention), so the PACF is undefined
            # too — emit NULL at every lag INCLUDING 0, mirroring the
            # acf member, instead of a hardcoded 1.0 + NaN tail (NaN
            # is not NULL through Arrow, so it would hash-diverge
            # from the SQL oracle's NULL propagation).
            return pd.DataFrame(
                {
                    SERIES: pdf[SERIES].iloc[: n + 1],
                    "lag": np.arange(n + 1, dtype=np.int32),
                    "pacf": pd.array([None] * (n + 1), dtype="Float64"),
                }
            )
        pacf = np.zeros(n + 1)
        pacf[0] = 1.0
        if n >= 1:
            pacf[1] = rho[1]
            phi_prev = np.array([rho[1]])
            for k in range(2, n + 1):
                num = rho[k] - float(phi_prev @ rho[k - 1 : 0 : -1])
                den = 1.0 - float(phi_prev @ rho[1:k])
                phi_kk = num / den if den != 0.0 else 0.0
                phi = np.empty(k)
                phi[:-1] = phi_prev - phi_kk * phi_prev[::-1]
                phi[-1] = phi_kk
                pacf[k] = phi_kk
                phi_prev = phi
        return pd.DataFrame(
            {
                SERIES: pdf[SERIES].iloc[0],
                "lag": np.arange(n + 1, dtype=np.int32),
                "pacf": np.round(pacf, 6),
            }
        )

    out = acf.groupBy(SERIES).applyInPandas(run, out_schema)
    if alpha is not None:
        # statsmodels plot_pacf band: constant z/sqrt(n) at every lag
        from scalecast_spark.functions.normal import norm_ppf

        z = norm_ppf(1.0 - alpha / 2.0)
        n_frame = (
            _prep_series(df, diffy, train_only, test_length)
            .groupBy(SERIES)
            .agg(F.count(Y).cast("double").alias("_n"))
        )
        out = (
            out.join(F.broadcast(n_frame), SERIES)
            .withColumn(
                "conf",
                F.when(F.col("lag") == 0, F.lit(0.0)).otherwise(
                    F.round(F.lit(z) / F.sqrt(F.col("_n")), 6)
                ),
            )
            .drop("_n")
        )
    return out.orderBy(SERIES, "lag")


def _null_bounds():
    return [
        F.lit(None).cast("double").alias("upper"),
        F.lit(None).cast("double").alias("lower"),
    ]


def forecast_plot_frame(
    f, models: list[str] | None = None, ci: bool = False
) -> DataFrame:
    """History + forecast overlay (reference Forecaster.plot,
    Forecaster.py:1790-1886): one long frame
    (series_id, ds, model, value, upper, lower); model='actuals' rows
    carry the observed history, each named model its horizon rows,
    with conformal bounds when ``ci`` and the model banked them."""
    models = list(models or f.history)
    parts = [
        _observed(f.tsf.df).select(
            SERIES, DS, F.lit("actuals").alias("model"),
            F.col(Y).alias("value"), *_null_bounds(),
        )
    ]
    for m in models:
        fc = f.history[m]["forecast"]
        has_ci = ci and "upper" in fc.columns
        bounds = (
            [F.col("upper"), F.col("lower")] if has_ci else _null_bounds()
        )
        parts.append(
            fc.select(
                SERIES, DS, F.lit(m).alias("model"),
                F.col("forecast").alias("value"), *bounds,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_set_plot_frame(
    f, models: list[str] | None = None, include_train: bool = True
) -> DataFrame:
    """Test-tail actuals vs each model's test predictions (reference
    plot_test_set, Forecaster.py:1887-1998). ``include_train=False``
    keeps only the test-window actual rows."""
    models = list(models or f.history)
    actuals = _observed(f.tsf.df).select(
        SERIES, DS, F.lit("actuals").alias("model"), F.col(Y).alias("value")
    )
    if not include_train and f.test_length:
        wrev = W.partitionBy(SERIES).orderBy(F.desc(DS))
        actuals = (
            _observed(f.tsf.df)
            .withColumn("_rev", F.row_number().over(wrev))
            .filter(F.col("_rev") <= f.test_length)
            .select(
                SERIES, DS, F.lit("actuals").alias("model"),
                F.col(Y).alias("value"),
            )
        )
    parts = [actuals]
    for m in models:
        tp = f.history[m]["test_preds"]
        if tp is None:
            continue
        parts.append(
            tp.select(
                SERIES, DS, F.lit(m).alias("model"),
                F.col("forecast").alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fitted_plot_frame(f, models: list[str] | None = None) -> DataFrame:
    """In-sample fitted values vs actuals (reference plot_fitted,
    Forecaster.py:1999-2063)."""
    models = list(models or f.history)
    parts = [
        _observed(f.tsf.df).select(
            SERIES, DS, F.lit("actuals").alias("model"), F.col(Y).alias("value")
        )
    ]
    for m in models:
        fit = f.history[m]["fitted"]
        if fit is None:  # combo()/synthesize_models() bank fitted=None
            continue
        parts.append(
            fit.select(
                SERIES, DS, F.lit(m).alias("model"),
                F.col("forecast").alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------------------- render

def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def render_lines(
    frame: DataFrame,
    x: str = DS,
    y: str = "value",
    hue: str = "model",
    series_col: str | None = SERIES,
    path: str | None = None,
    title: str | None = None,
):
    """Draw the overlay chart from a plot frame (one line per ``hue``
    value; per-series subplots when ``series_col`` is set). Returns the
    matplotlib Figure, or None (with a warning) when matplotlib is not
    installed — the caller still holds the data frame either way.

    The ONLY driver materialization is the frame being drawn — callers
    pass already-reduced plot payloads (horizon + history rows), never
    raw corpora.
    """
    plt = _plt()
    if plt is None:
        warnings.warn(
            "matplotlib is not installed — render skipped; the returned "
            "plot frame holds the full payload (install matplotlib to draw)"
        )
        return None
    pdf = frame.toPandas()
    panels = (
        sorted(pdf[series_col].dropna().unique())
        if series_col and series_col in pdf.columns
        else [None]
    )
    fig, axes = plt.subplots(
        len(panels), 1, figsize=(10, 3 * len(panels)), squeeze=False
    )
    for ax, panel in zip(axes[:, 0], panels):
        sub = pdf if panel is None else pdf[pdf[series_col] == panel]
        for name, grp in sub.groupby(hue):
            grp = grp.sort_values(x)
            ax.plot(grp[x], grp[y], label=str(name))
            if {"upper", "lower"} <= set(grp.columns) and grp["upper"].notna().any():
                ax.fill_between(
                    grp[x], grp["lower"], grp["upper"], alpha=0.2
                )
        ax.legend(loc="best", fontsize=8)
        if panel is not None:
            ax.set_title(str(panel))
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path)
    return fig


def render_stems(
    frame: DataFrame,
    x: str = "lag",
    y: str = "acf",
    series_col: str | None = SERIES,
    path: str | None = None,
    title: str | None = None,
):
    """Correlogram renderer (stem-style bars per lag), matplotlib-gated
    exactly like :func:`render_lines`."""
    plt = _plt()
    if plt is None:
        warnings.warn(
            "matplotlib is not installed — render skipped; the returned "
            "correlogram frame holds the full payload"
        )
        return None
    pdf = frame.toPandas()
    panels = (
        sorted(pdf[series_col].dropna().unique())
        if series_col and series_col in pdf.columns
        else [None]
    )
    fig, axes = plt.subplots(
        len(panels), 1, figsize=(10, 2.5 * len(panels)), squeeze=False
    )
    for ax, panel in zip(axes[:, 0], panels):
        sub = pdf if panel is None else pdf[pdf[series_col] == panel]
        sub = sub.sort_values(x)
        ax.bar(sub[x], sub[y], width=0.3)
        ax.axhline(0.0, linewidth=0.8)
        if "conf" in sub.columns and sub["conf"].notna().any():
            ax.fill_between(sub[x], -sub["conf"], sub["conf"], alpha=0.15)
        if panel is not None:
            ax.set_title(str(panel))
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path)
    return fig


def plot_reduction_errors(f, path: str | None = None, title: str | None = None):
    """Error trajectory of backward feature elimination (reference
    util.plot_reduction_errors, util.py:85-110): the validation error
    after each accepted drop recorded by selection.reduce_Xvars
    (``f.pfi_dropped_vars`` / ``f.pfi_error_values`` — driver-sized
    lists, one float per drop, so there is nothing to distribute).
    Returns the matplotlib Figure, or the (n_dropped, error) pairs
    when matplotlib is absent — same gating contract as render_lines.
    """
    dropped = getattr(f, "pfi_dropped_vars", None)
    errors = getattr(f, "pfi_error_values", None)
    if errors is None:
        raise ValueError(
            "plot_reduction_errors: call selection.reduce_Xvars(f, ...) "
            "first — it records pfi_dropped_vars / pfi_error_values"
        )
    pairs = list(enumerate(errors))
    plt = _plt()
    if plt is None:
        warnings.warn(
            "matplotlib is not installed — render skipped; returning the "
            "(n_dropped, error) trajectory"
        )
        return pairs
    fig, ax = plt.subplots(figsize=(12, 6))
    ax.plot([p[0] for p in pairs], [p[1] for p in pairs], marker="o")
    for i, name in enumerate(dropped or []):
        ax.annotate(
            str(name), (i + 1, errors[i + 1]), fontsize=7, rotation=45
        )
    ax.set_xlabel("dropped Xvars")
    ax.set_ylabel("error")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path)
    return fig


def plot_rnn_loss(
    loss_frame: DataFrame,
    title: str | None = None,
    path: str | None = None,
):
    """Training-loss curves of the rnn/lstm estimator (reference
    util.plot_rnn_loss over one TF History, util.py:23-56) from the
    (series_id, epoch, loss) frame produced by
    models.mlp.rnn_loss_frame — one curve per series, because every
    series trains its own cell inside the kernel. The only driver
    materialization is the loss frame itself (epochs × series floats).
    Returns the Figure, or None with a warning when matplotlib is
    absent (the caller still holds the frame)."""
    plt = _plt()
    if plt is None:
        warnings.warn(
            "matplotlib is not installed — render skipped; the loss "
            "frame holds the full payload"
        )
        return None
    pdf = loss_frame.toPandas()
    fig, ax = plt.subplots(figsize=(12, 6))
    for sid, grp in pdf.groupby(SERIES):
        grp = grp.sort_values("epoch")
        ax.plot(grp["epoch"], grp["loss"], label=str(sid))
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend(loc="upper right", fontsize=8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path)
    return fig
