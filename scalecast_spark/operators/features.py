"""Feature-generation operators (SURVEY.md §2.2).

Each mirrors one ``add_*`` method of the reference and is a pure
DataFrame→DataFrame function: window/expression-only, no UDFs, so the
whole feature build stays inside whole-stage codegen and one sort per
(series, ds) window is shared by every lag-family column.

All operators run over the unified observed+future frame — the
reference's separate current_xreg/future_xreg dicts
(_Forecaster_parent.py:61-62) collapse into columns whose future-row
values fall out of the same expressions. AR features on future rows are
NULL past the observed tail (reference invariant, Forecaster.py:434-435)
and are filled recursively at predict time by the model kernel.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y

_ORDERED = lambda: W.partitionBy(SERIES).orderBy(DS)  # noqa: E731

#: calendar part extractors (reference's pandas .dt accessor menu,
#: _Forecaster_parent.py:162-273)
CALENDAR_PARTS = {
    "year": lambda c: F.year(c),
    "quarter": lambda c: F.quarter(c),
    "month": lambda c: F.month(c),
    "week": lambda c: F.weekofyear(c),
    "day": lambda c: F.dayofmonth(c),
    "dayofweek": lambda c: F.dayofweek(c),
    "dayofyear": lambda c: F.dayofyear(c),
    "hour": lambda c: F.hour(c),
    "minute": lambda c: F.minute(c),
}

#: default cycle lengths for sincos encoding, keyed by part
#: (reference util.py:58-83 seasonal-length map)
DEFAULT_CYCLE_LENS = {
    "quarter": 4.0,
    "month": 12.0,
    "week": 52.0,
    "day": 31.0,
    "dayofweek": 7.0,
    "dayofyear": 365.25,
    "hour": 24.0,
    "minute": 60.0,
}


def add_ar_terms(df: DataFrame, lags: int | list[int], col: str = Y) -> tuple[DataFrame, list[str]]:
    """y lags 1..n (or an explicit lag list) as features ``ar_<k>``.

    Reference add_ar_terms (Forecaster.py:409-436). One window sort
    serves every lag — Catalyst collapses same-window ``F.lag`` chains
    into a single Window physical node (verified via explain), so this
    is one shuffle regardless of how many lags are requested.
    """
    lag_list = list(range(1, lags + 1)) if isinstance(lags, int) else list(lags)
    w = _ORDERED()
    names = [f"ar_{k}" for k in lag_list]
    out = df.select(
        "*", *[F.lag(col, k).over(w).alias(f"ar_{k}") for k in lag_list]
    )
    return out, names


def add_seasonal_ar_terms(df: DataFrame, N: int, m: int) -> tuple[DataFrame, list[str]]:
    """Seasonal lags m, 2m, ..., N*m (reference add_AR_terms,
    Forecaster.py:438-449)."""
    return add_ar_terms(df, [m * i for i in range(1, N + 1)])


def add_time_trend(df: DataFrame, name: str = "t") -> tuple[DataFrame, list[str]]:
    """t = 1..n over observed+future rows
    (reference _Forecaster_parent.py:275-293)."""
    out = df.withColumn(name, F.row_number().over(_ORDERED()).cast("double"))
    return out, [name]


def add_seasonal_regressors(
    df: DataFrame,
    parts: list[str],
    raw: bool = True,
    sincos: bool = False,
    dummy: bool = False,
    cycle_lens: dict[str, float] | None = None,
    fourier_order: float = 2.0,
) -> tuple[DataFrame, list[str]]:
    """Calendar features: raw integer parts, Fourier sin/cos pairs, and/or
    one-hot dummies (reference _Forecaster_parent.py:162-273).

    The reference's sincos encoding is ``sin(pi * x / (cycle/order))``
    per order 1..fourier_order — replicated exactly; dummies are emitted
    as deterministic fixed-vocabulary 0/1 columns (no StringIndexer: the
    calendar vocabulary is known, which keeps this a pure projection).
    """
    cycle_lens = {**DEFAULT_CYCLE_LENS, **(cycle_lens or {})}
    names: list[str] = []
    out = df
    for part in parts:
        extract = CALENDAR_PARTS[part]
        x = extract(F.col(DS)).cast("double")
        if raw:
            out = out.withColumn(part, x)
            names.append(part)
        if sincos:
            L = cycle_lens.get(part)
            if L is None:
                raise ValueError(f"no cycle length known for {part!r}")
            for order in range(1, int(fourier_order) + 1):
                s, c = f"{part}sin{order}", f"{part}cos{order}"
                out = out.withColumn(s, F.sin(math.pi * x / (L / order)))
                out = out.withColumn(c, F.cos(math.pi * x / (L / order)))
                names += [s, c]
        if dummy:
            lo, hi = {"quarter": (1, 4), "month": (1, 12), "dayofweek": (1, 7)}.get(part, (None, None))
            if lo is None:
                raise ValueError(f"dummy encoding unsupported for {part!r}")
            for v in range(lo, hi + 1):
                nm = f"{part}_{v}"
                out = out.withColumn(nm, (x == v).cast("double"))
                names.append(nm)
    return out, names


def add_cycle(df: DataFrame, cycle_length: float, fourier_order: float = 2.0, called: str | None = None) -> tuple[DataFrame, list[str]]:
    """Irregular-period Fourier pair over the row index
    (reference _Forecaster_parent.py:448-481)."""
    called = called or f"cycle{int(cycle_length)}"
    t = F.row_number().over(_ORDERED()).cast("double")
    out, names = df, []
    for order in range(1, int(fourier_order) + 1):
        s, c = f"{called}sin{order}", f"{called}cos{order}"
        out = out.withColumn(s, F.sin(math.pi * t / (cycle_length / order)))
        out = out.withColumn(c, F.cos(math.pi * t / (cycle_length / order)))
        names += [s, c]
    return out, names


def add_other_regressor(df: DataFrame, called: str, start: str, end: str) -> tuple[DataFrame, list[str]]:
    """0/1 dummy for a date window (reference
    _Forecaster_parent.py:483-507; covid19 variant 509-533)."""
    out = df.withColumn(
        called,
        F.when(F.col(DS).between(F.lit(start), F.lit(end)), 1.0).otherwise(0.0),
    )
    return out, [called]


def add_combo_regressors(df: DataFrame, *cols: str) -> tuple[DataFrame, list[str]]:
    """Elementwise product of existing regressors
    (reference _Forecaster_parent.py:535-570)."""
    name = "_".join(cols)
    expr = F.lit(1.0)
    for c in cols:
        expr = expr * F.col(c)
    return df.withColumn(name, expr), [name]


def add_poly_terms(df: DataFrame, *cols: str, pwr: int = 2) -> tuple[DataFrame, list[str]]:
    """Integer powers 2..pwr (reference _Forecaster_parent.py:572-593)."""
    out, names = df, []
    for c in cols:
        for p in range(2, pwr + 1):
            nm = f"{c}^{p}"
            out = out.withColumn(nm, F.pow(F.col(c), float(p)))
            names.append(nm)
    return out, names


def add_exp_terms(df: DataFrame, *cols: str, pwr: float) -> tuple[DataFrame, list[str]]:
    """Arbitrary float power (reference _Forecaster_parent.py:595-629).
    Names round the power to 2dp like the reference (t^0.51), with '_'
    for the decimal point — a '.' in a column name parses as a struct
    path in F.col() (frame.with_features rejects it)."""
    out, names = df, []
    p2 = round(float(pwr), 2)
    tag = str(int(p2)) if p2 == int(p2) else str(p2).replace(".", "_")
    for c in cols:
        nm = f"{c}^{tag}"
        out = out.withColumn(nm, F.pow(F.col(c), float(pwr)))
        names.append(nm)
    return out, names


def add_logged_terms(df: DataFrame, *cols: str, base: float = math.e) -> tuple[DataFrame, list[str]]:
    """log-base-b of regressors (reference _Forecaster_parent.py:631-673)."""
    out, names = df, []
    for c in cols:
        nm = f"ln_{c}" if base == math.e else f"log{int(base)}_{c}"
        out = out.withColumn(nm, F.log(float(base), F.col(c)) if base != math.e else F.log(F.col(c)))
        names.append(nm)
    return out, names


def add_lagged_terms(df: DataFrame, *cols: str, lags: int = 1, upto: bool = True) -> tuple[DataFrame, list[str]]:
    """Lags of regressors, ``<col>_lag_<k>`` (reference
    _Forecaster_parent.py:1358-1434). Future rows get real values because
    the lag runs over the unified observed+future frame — the reference's
    current+future concat stitching happens for free."""
    w = _ORDERED()
    lag_list = range(1, lags + 1) if upto else [lags]
    names = [f"{c}_lag_{k}" for c in cols for k in lag_list]
    out = df.select(
        "*",
        *[
            F.lag(c, k).over(w).alias(f"{c}_lag_{k}")
            for c in cols
            for k in lag_list
        ],
    )
    return out, names


def _boxcox_mle_lambda(x, grid=None) -> float:
    """Box-Cox lambda by profile log-likelihood over a grid (numpy-only
    equivalent of sklearn PowerTransformer's MLE; x must be > 0)."""
    import numpy as np

    x = np.asarray(x, dtype=float)
    logx = np.log(x)
    n = len(x)
    best_l, best_ll = 1.0, -np.inf
    for lam in (grid if grid is not None else np.linspace(-2, 2, 81)):
        if abs(lam) < 1e-12:
            z = logx
        else:
            z = (np.power(x, lam) - 1.0) / lam
        var = z.var()
        if var <= 0:
            continue
        ll = -0.5 * n * math.log(var) + (lam - 1.0) * logx.sum()
        if ll > best_ll:
            best_ll, best_l = ll, lam
    return float(best_l)


def _yeojohnson_z(x, lam):
    """Yeo-Johnson transform of a numpy array at a given lambda."""
    import numpy as np

    x = np.asarray(x, dtype=float)
    pos = x >= 0
    z = np.empty_like(x)
    if abs(lam) < 1e-12:
        z[pos] = np.log1p(x[pos])
    else:
        z[pos] = (np.power(x[pos] + 1.0, lam) - 1.0) / lam
    if abs(lam - 2.0) < 1e-12:
        z[~pos] = -np.log1p(-x[~pos])
    else:
        z[~pos] = -(np.power(1.0 - x[~pos], 2.0 - lam) - 1.0) / (2.0 - lam)
    return z


def _yeojohnson_mle_lambda(x, grid=None) -> float:
    """Yeo-Johnson lambda by profile log-likelihood over the same grid
    as Box-Cox (numpy equivalent of sklearn
    PowerTransformer(method='yeo-johnson'); handles any real x —
    reference _Forecaster_parent.py:675-718)."""
    import numpy as np

    x = np.asarray(x, dtype=float)
    n = len(x)
    if n == 0:
        return 1.0
    slog = (np.sign(x) * np.log1p(np.abs(x))).sum()
    best_l, best_ll = 1.0, -np.inf
    for lam in (grid if grid is not None else np.linspace(-2, 2, 81)):
        z = _yeojohnson_z(x, lam)
        var = z.var()
        if var <= 0:
            continue
        ll = -0.5 * n * math.log(var) + (lam - 1.0) * slog
        if ll > best_ll:
            best_ll, best_l = ll, lam
    return float(best_l)


def yeojohnson_expr(c, lam: float):
    """Yeo-Johnson as a column expression at a FITTED lambda — branch
    bases (1+x, 1-x) are strictly positive on their branch, so pow is
    always well-defined."""
    if abs(lam) < 1e-12:
        pos = F.log1p(c)
    else:
        pos = (F.pow(c + F.lit(1.0), F.lit(lam)) - 1.0) / lam
    if abs(lam - 2.0) < 1e-12:
        neg = -F.log1p(-c)
    else:
        neg = -(F.pow(F.lit(1.0) - c, F.lit(2.0 - lam)) - 1.0) / (2.0 - lam)
    return F.when(c >= 0, pos).otherwise(neg)


def add_pt_terms(df: DataFrame, *cols: str, method: str = "boxcox") -> tuple[DataFrame, list[str]]:
    """Power-transform regressors (reference add_pt_terms,
    _Forecaster_parent.py:675-718, via sklearn PowerTransformer):
    ``boxcox`` (x > 0) or ``yeojohnson`` (any real x, the negative-
    regressor path).

    λ is found by MLE on the observed rows (one small sample collect per
    column — regressor stats, not data-scale); the transform itself is
    a column expression. NOTE: the reference refits λ separately on the
    future slice (a quirk flagged in SURVEY.md §2.2); we fit ONCE on
    observed data, the statistically sound behavior.
    """
    method = method.replace("-", "").replace("_", "").lower()
    if method not in ("boxcox", "yeojohnson"):
        raise ValueError(f"method must be boxcox or yeojohnson, got {method!r}")
    out, names = df, []
    for c in cols:
        nm = f"{c}_pt"
        if method == "boxcox":
            vals = [
                r[0]
                for r in df.filter(F.col(IS_FUTURE) == 0)
                .select(c).filter(F.col(c) > 0).limit(100000).collect()
            ]
            lam = _boxcox_mle_lambda(vals)
            if abs(lam) < 1e-12:
                out = out.withColumn(nm, F.log(F.col(c)))
            else:
                out = out.withColumn(nm, (F.pow(F.col(c), lam) - 1.0) / lam)
        else:
            vals = [
                r[0]
                for r in df.filter(F.col(IS_FUTURE) == 0)
                .select(c).filter(F.col(c).isNotNull()).limit(100000).collect()
            ]
            lam = _yeojohnson_mle_lambda(vals)
            out = out.withColumn(nm, yeojohnson_expr(F.col(c), lam))
        names.append(nm)
    return out, names


def add_rolling_mean(df: DataFrame, window: int, col: str = Y, min_periods: int = 1) -> tuple[DataFrame, list[str]]:
    """Trailing moving average over the prior ``window`` rows (excludes
    the current row, so it is usable as a leak-free feature; also the
    moving_average imputation kernel, reference util.py:1085-1115)."""
    w = _ORDERED().rowsBetween(-window, -1)
    name = f"rolling_mean_{window}"
    cnt = F.count(col).over(w)
    out = df.withColumn(
        name, F.when(cnt >= min_periods, F.avg(col).over(w))
    )
    return out, [name]


def add_rolling_stats(
    df: DataFrame, window: int, col: str = Y, stats: tuple[str, ...] = ("std", "min", "max")
) -> tuple[DataFrame, list[str]]:
    """Trailing rolling std/min/max over the prior ``window`` rows —
    the rest of the rolling-feature menu. One shared window frame; all
    stats ride the same sort."""
    w = _ORDERED().rowsBetween(-window, -1)
    fns = {"std": F.stddev_samp, "min": F.min, "max": F.max, "sum": F.sum}
    names = []
    out = df
    for s in stats:
        nm = f"rolling_{s}_{window}"
        out = out.withColumn(nm, fns[s](col).over(w))
        names.append(nm)
    return out, names


def add_ewma(df: DataFrame, alpha: float = 0.3, col: str = Y) -> tuple[DataFrame, list[str]]:
    """Exponentially-weighted moving average of the PRIOR observations
    (leak-free). EWMA is a linear recursion (not a fixed window), so it
    runs in the per-series kernel path via aggregate over a collected
    window — implemented as a bounded approximation: weights decay
    below 1e-4 after k* = ceil(ln(1e-4)/ln(1-alpha)) rows, so a
    k*-row window is numerically exact in double precision."""
    import math as _m

    k = max(int(_m.ceil(_m.log(1e-4) / _m.log(1.0 - alpha))), 1)
    w = _ORDERED().rowsBetween(-k, -1)
    # dot-free name: "0.3" would parse as a struct path in F.col()
    name = f"ewma_{str(alpha).replace('.', '_')}"
    vals = F.collect_list(col).over(w)
    # weights: alpha*(1-alpha)^(n-1-i) over the collected (oldest-first)
    # list, normalized over the present terms (pandas ewm adjust=True)
    n = F.size(vals)
    idx = F.sequence(F.lit(0), n - 1)
    wts = F.transform(idx, lambda i: F.pow(F.lit(1.0 - alpha), (n - 1 - i).cast("double")))
    num = F.aggregate(
        F.zip_with(vals, wts, lambda v, ww: v * ww), F.lit(0.0), lambda a, x: a + x
    )
    den = F.aggregate(wts, F.lit(0.0), lambda a, x: a + x)
    out = df.withColumn(name, F.when(n > 0, num / den))
    return out, [name]
