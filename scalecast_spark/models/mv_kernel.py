"""Generic multivariate wide-lag kernel — the FULL SKLearnMV strategy
(reference src/scalecast/models.py:164-420: MVForecaster re-wraps the
entire sklearn estimator family; registry cfg.py:50-54; exercised by
test/test_MVForecaster.py's CV sweep over rf/gbt/etc.).

models/mv_linear.py carries the closed-form linear core (hash-matched
in the driver gate); this module generalizes the SAME design
construction and joint recursive forecast loop to ANY estimator with
the kernel fit protocol ``fit_fn(X, y) -> predict`` — which every
member of KERNEL_FACTORIES (ridge/lasso/elasticnet/knn/svr/sgd/gbt/
xgboost/catboost/rf/mlp) already satisfies. One model per target
series over the shared wide-lag design; each recursive step predicts
ALL series jointly and feeds the new row back into every series' lag
vector.

Scale shape: identical to mv_linear — ONE applyInPandas task per MV
*family* (families are handfuls of co-moving series; the wide matrix
is family-sized, never corpus-sized). A corpus of many families
distributes on the family key; n fits of R×(n·L) designs are
microseconds-to-milliseconds of numpy per task. No driver collect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y


def mv_design(Ymat: np.ndarray, lags: int) -> tuple[np.ndarray, np.ndarray]:
    """Wide-lag design over a [T x n] level matrix: R = T-L rows,
    D = n·L columns, column c = (l-1)·n + s encoding lag l of series s
    — the exact layout of mv_linear_fit_forecast (and of the
    _mv_linear_oracle SQL replay)."""
    Tn, n = Ymat.shape
    L = int(lags)
    R, D = Tn - L, n * L
    X = np.empty((R, D))
    for c in range(D):
        l, s = c // n + 1, c % n
        X[:, c] = Ymat[L - l: Tn - l, s]
    return X, Ymat[L:]


def mv_fit_forecast(
    Ymat: np.ndarray,
    h: int,
    lags: int,
    fit_fn,
    exog: np.ndarray | None = None,
    exog_future: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit one ``fit_fn`` model per target series on the shared
    wide-lag design and forecast ``h`` steps jointly (each step's
    predicted row appended to the history so every later step consumes
    every series' earlier predictions — the SKLearnMV recursive
    semantics, reference models.py:268-333).

    ``exog`` ([T x p], one row per observed time) appends the family's
    shared regressors at the TARGET time to every design row — the
    reference MVForecaster's Xvars (calendar/trend features shared by
    the family, models.py:204-247); ``exog_future`` ([>=h x p]) must
    then supply their future values (known for generated
    calendar/trend features), consumed positionally by the recursion.

    Returns (fitted [T x n] — first L rows echo actuals, matching
    mv_linear_fit_forecast's pre-sample convention — and
    forecast [h x n])."""
    Ymat = np.asarray(Ymat, float)
    Tn, n = Ymat.shape
    L = int(lags)
    if Tn < L + 2:
        raise ValueError(f"need at least lags+2={L + 2} rows (got {Tn})")
    X, Yt = mv_design(Ymat, L)
    if exog is not None:
        exog = np.atleast_2d(np.asarray(exog, float))
        if len(exog) != Tn:
            raise ValueError(
                f"exog has {len(exog)} rows, need one per observed "
                f"time ({Tn})"
            )
        if int(h) > 0:
            if exog_future is None or len(exog_future) < int(h):
                raise ValueError(
                    "exog given: exog_future must supply >= h rows"
                )
            exog_future = np.atleast_2d(np.asarray(exog_future, float))
        X = np.hstack([X, exog[L:]])
    predictors = [fit_fn(X, Yt[:, j]) for j in range(n)]

    fitted = Ymat.copy()
    for j, p in enumerate(predictors):
        fitted[L:, j] = p(X)

    hist = Ymat.copy()
    out = []
    for step in range(int(h)):
        x = np.empty((1, n * L))
        for c in range(n * L):
            l, s = c // n + 1, c % n
            x[0, c] = hist[-l, s]
        if exog is not None:
            x = np.hstack([x, exog_future[step: step + 1]])
        nxt = np.array([float(p(x)[0]) for p in predictors])
        out.append(nxt)
        hist = np.vstack([hist, nxt])
    return fitted, np.asarray(out).reshape(int(h), n)


def mv_apply(
    df: DataFrame,
    family_col: str | None,
    core,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Distribute a per-family MV core (``core(Ymat, h) -> (fitted,
    fc)``) over the long frame: pivot each family wide inside its
    applyInPandas task, run the core, and re-join the long forecast
    column. The family groupBy is the ONLY shuffle; at 100 TB the key
    must be the family, never the corpus.

    With ``feature_cols`` the core is called ``core(Ymat, h, X_obs,
    X_fut)`` where the exog matrices carry the family's SHARED
    regressors per ds (first value per ds — calendar/trend features
    are identical across a family's series by construction, the
    reference MVForecaster Xvars posture); future rows must carry
    their regressor values, which generated calendar/trend features
    do."""
    fam = family_col or "_mvfam"
    src = df if family_col else df.withColumn(fam, F.lit(0))
    schema = T.StructType(
        [
            T.StructField(SERIES, df.schema[SERIES].dataType),
            T.StructField(DS, df.schema[DS].dataType),
            T.StructField("forecast", T.DoubleType()),
        ]
    )
    feats = list(feature_cols or [])

    def fit_predict(pdf: pd.DataFrame) -> pd.DataFrame:
        wide = (
            pdf[pdf[IS_FUTURE] == 0]
            .pivot_table(index=DS, columns=SERIES, values=Y, aggfunc="first")
            .sort_index()
        )
        sids = sorted(wide.columns)
        wide = wide[sids]
        Ymat = wide.to_numpy(float)
        fut = pdf[pdf[IS_FUTURE] == 1]
        h = int(fut.groupby(SERIES)[DS].count().max()) if len(fut) else 0
        if feats:
            per_ds = (
                pdf.sort_values([DS, SERIES])
                .groupby(DS, as_index=True)[feats]
                .first()
                .sort_index()
            )
            obs_idx = wide.index
            X_obs = per_ds.loc[obs_idx].to_numpy(float)
            fut_idx = sorted(set(fut[DS]))
            X_fut = (
                per_ds.loc[fut_idx].to_numpy(float)
                if fut_idx
                else np.empty((0, len(feats)))
            )
            fitted, fc = core(Ymat, h, X_obs, X_fut)
        else:
            fitted, fc = core(Ymat, h)
        frames = [
            pd.DataFrame({SERIES: sid, DS: wide.index, "forecast": fitted[:, j]})
            for j, sid in enumerate(sids)
        ]
        if h:
            for j, sid in enumerate(sids):
                fds = sorted(fut.loc[fut[SERIES] == sid, DS])
                steps = min(len(fds), h)
                frames.append(
                    pd.DataFrame(
                        {SERIES: sid, DS: fds[:steps], "forecast": fc[:steps, j]}
                    )
                )
        return pd.concat(frames, ignore_index=True)

    scored = src.groupBy(fam).applyInPandas(fit_predict, schema)
    return df.join(scored, [SERIES, DS], "left")


def mv_model(
    df: DataFrame,
    estimator: str = "ridge",
    features=None,
    lags: int = 2,
    family_col: str | None = None,
    **est_kwargs,
) -> DataFrame:
    """Registry adapter ('mv_sklearn' and the per-estimator 'mv_*'
    aliases): joint wide-lag forecast with ANY kernel estimator —
    the reference MVForecaster surface (set_estimator over the whole
    sklearn family). ``features`` names shared exog regressor columns
    (calendar/trend features generated into the future) appended to
    the wide-lag design at the target time — the MVForecaster Xvars;
    omit for the lags-only design.

    >>> MODELS["mv_rf"](tsf.df, lags=3, n_estimators=100)
    >>> MODELS["mv_sklearn"](tsf.df, estimator="gbt", lags=2)
    >>> mv_model(df, "ridge", features=["t", "dowsin1"], lags=2)
    """
    from scalecast_spark.models import KERNEL_FACTORIES

    if estimator not in KERNEL_FACTORIES:
        raise ValueError(
            f"unknown estimator {estimator!r}; one of "
            f"{sorted(KERNEL_FACTORIES)}"
        )
    # reference-surface kwargs every sklearn grid carries: the joint
    # recursion is inherently dynamic (dynamic_testing is a no-op
    # here, as in the reference's MV default), and normalizer wraps
    # the kernel fit so the wide-lag design is scaled fit-on-train
    est_kwargs.pop("dynamic_testing", None)
    norm_name = est_kwargs.pop("normalizer", None)
    fit_fn = KERNEL_FACTORIES[estimator](**est_kwargs)
    if norm_name:
        from scalecast_spark.models.kernel import (
            _fit_normalizer, _resolve_normalizer,
        )

        base_fit = fit_fn
        nz = _resolve_normalizer(norm_name)

        def fit_fn(X, y, _b=base_fit, _n=nz):  # noqa: F811
            norm = _fit_normalizer(_n, X)
            predict = _b(norm(X), y)
            return lambda Xn: predict(norm(Xn))
    L = int(lags)
    feats = list(features) if features else None
    if feats:
        return mv_apply(
            df, family_col,
            lambda Ymat, h, Xo, Xf: mv_fit_forecast(
                Ymat, h, L, fit_fn, exog=Xo, exog_future=Xf
            ),
            feature_cols=feats,
        )
    return mv_apply(
        df, family_col, lambda Ymat, h: mv_fit_forecast(Ymat, h, L, fit_fn)
    )
