"""Round-15 verdict/advice items: reference-exact weighted combo
(ValidationMetricValue default + weights= + replace_negative_weights=,
reference models.py:1493-1648), export(to_excel=True) returning the
frames (reference Forecaster.py:2217-2219), rnn/lstm layers_struct
mapping (reference models.py:561-878), numpy metric-twin NaN parity
(reference Metrics.py:69-72), anchored-frequency densify in
Forecaster_with_missing_vals, and MVForecaster(cis=True) soundness."""

import warnings

import numpy as np
import pandas as pd
import pytest

from scalecast_spark import Forecaster
from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.models.combo import derive_weights


def _daily(spark, n=60, sids=("a",), seed=3, trend=0.3):
    rng = np.random.default_rng(seed)
    frames = []
    for s in sids:
        ds = pd.date_range("2024-01-01", periods=n, freq="D")
        y = 50 + trend * np.arange(n) + rng.normal(0, 2, n)
        frames.append(pd.DataFrame({SERIES: s, DS: ds, Y: y}))
    return spark.createDataFrame(pd.concat(frames))


# ------------------------------------------------- derive_weights math
def test_derive_weights_reference_math_lower_is_better():
    """Reference fit() (models.py:1604-1617): score/sum then list
    REVERSAL for lower-is-better metrics."""
    w = derive_weights([1.0, 3.0], lower_is_better=True)
    assert w == [0.75, 0.25]


def test_derive_weights_negative_replacement_higher_is_better():
    """For higher-is-better metrics (r2), negatives are replaced by
    replace_negative_weights (default 0.001) WITHOUT renormalizing —
    the reference's elif branch."""
    w = derive_weights([3.0, -1.0], lower_is_better=False)
    assert w == [1.5, 0.001]
    w_off = derive_weights(
        [3.0, -1.0], lower_is_better=False, replace_negative_weights=False
    )
    assert w_off == [1.5, -0.5]
    w_zero = derive_weights(
        [3.0, -1.0], lower_is_better=False, replace_negative_weights=0
    )
    assert w_zero == [1.5, 0.0]


def test_derive_weights_negative_replacement_skipped_when_lower():
    """The reference only replaces negatives in the elif (i.e. NOT for
    lower-is-better metrics) — keep the quirk."""
    w = derive_weights([3.0, -1.0], lower_is_better=True)
    assert w == [-0.5, 1.5]


# ------------------------------------------------- weighted combo
def _tuned_two_model_forecaster(spark):
    f = Forecaster(
        _daily(spark, 80), future_dates=5, test_length=10,
        validation_length=10,
    )
    f.add_time_trend()
    f.add_ar_terms(2)
    f.set_estimator("mlr")
    f.ingest_grid({"normalizer": [None]})
    f.tune()
    f.auto_forecast()
    f.set_estimator("lasso")
    f.ingest_grid({"alpha": [0.1, 1.0]})
    f.tune()
    f.auto_forecast()
    return f


def test_weighted_combo_defaults_to_validation_metric(spark):
    """Tuned members carry ValidationMetricValue → the weighted combo
    weights by it (reference default, models.py:1525), replicating
    score/sum + reversal exactly."""
    f = _tuned_two_model_forecaster(spark)
    models = ["mlr", "lasso"]
    f.set_estimator("combo")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning expected
        f.manual_forecast(how="weighted", models=models, call_me="wcombo")
    scores = [
        f.history[m]["summary"]["ValidationMetricValue"] for m in models
    ]
    expect = [s / sum(scores) for s in scores]
    expect.reverse()  # rmse → lower_is_better → reference reversal
    got = f.history["wcombo"]["summary"]["hyperparams"]["weights"]
    assert got == pytest.approx(expect)
    # and the forecast itself is the un-renormalized weighted sum
    member = {
        m: f.history[m]["forecast"].orderBy(DS).toPandas() for m in models
    }
    combo = f.history["wcombo"]["forecast"].orderBy(DS).toPandas()
    manual = (
        expect[0] * member["mlr"]["forecast"].to_numpy()
        + expect[1] * member["lasso"]["forecast"].to_numpy()
    )
    np.testing.assert_allclose(
        combo["forecast"].to_numpy(), manual, rtol=1e-9
    )


def test_weighted_combo_explicit_weights(spark):
    """weights= normalizes w/sum(w) (reference models.py:1621) and a
    length mismatch raises the reference's ValueError."""
    f = _tuned_two_model_forecaster(spark)
    f.combo(
        ["mlr", "lasso"], call_me="wexp", how="weighted", weights=[3, 1],
    )
    member = {
        m: f.history[m]["forecast"].orderBy(DS).toPandas()
        for m in ("mlr", "lasso")
    }
    combo = f.history["wexp"]["forecast"].orderBy(DS).toPandas()
    manual = (
        0.75 * member["mlr"]["forecast"].to_numpy()
        + 0.25 * member["lasso"]["forecast"].to_numpy()
    )
    np.testing.assert_allclose(combo["forecast"].to_numpy(), manual, rtol=1e-9)
    with pytest.raises(ValueError, match="must match"):
        f.combo(["mlr", "lasso"], how="weighted", weights=[1.0])


def test_weighted_combo_falls_back_with_warning(spark):
    """Members without a banked ValidationMetricValue → warn + weight
    by TestSetRMSE instead of silently remapping."""
    f = Forecaster(_daily(spark, 80), future_dates=5, test_length=10)
    f.set_estimator("naive")
    f.manual_forecast(m=7)
    f.set_estimator("hwes")
    f.manual_forecast(trend=False, seasonal=False, call_me="ses")
    with pytest.warns(UserWarning, match="TestSetRMSE"):
        f.combo(["naive", "ses"], call_me="wc", how="weighted")
    scores = [
        f.history[m]["summary"]["TestSetRMSE"] for m in ("naive", "ses")
    ]
    expect = [s / sum(scores) for s in scores]
    expect.reverse()
    got = f.history["wc"]["summary"]["hyperparams"]["weights"]
    assert got == pytest.approx(expect)


# ------------------------------------------------- export(to_excel=True)
def test_export_to_excel_returns_frames(spark, tmp_path):
    """Reference Forecaster.py:2217-2219: the workbook write is a side
    effect; export() still returns the frame/dict so
    'results["model_summaries"]' works on ported code."""
    f = Forecaster(_daily(spark, 40), future_dates=5, test_length=5)
    f.set_estimator("naive")
    f.manual_forecast(m=7)
    out = f.export(
        dfs=["model_summaries", "lvl_fcsts"], to_excel=True,
        out_path=str(tmp_path), excel_name="res.xlsx",
    )
    assert isinstance(out, dict)
    assert set(out) == {"model_summaries", "lvl_fcsts"}
    assert out["model_summaries"].count() >= 1
    # single-name dfs → the lone frame, still written as a side effect
    lone = f.export(
        dfs=["lvl_fcsts"], to_excel=True, out_path=str(tmp_path),
        excel_name="res2.xlsx",
    )
    assert hasattr(lone, "toPandas")
    # the workbook (or its CSV-directory fallback) landed on disk
    import os

    assert any(p.startswith("res") for p in os.listdir(tmp_path))


def test_export_to_excel_threads_model_filter(spark, tmp_path):
    """models= reaches the sheet exports instead of being dropped."""
    f = Forecaster(_daily(spark, 40), future_dates=5, test_length=5)
    f.set_estimator("naive")
    f.manual_forecast(m=7)
    f.manual_forecast(m=1, call_me="naive1")
    out = f.export(
        dfs=["model_summaries"], to_excel=True, models="naive",
        out_path=str(tmp_path), excel_name="res3.xlsx",
    )
    pdf = out.toPandas()
    assert list(pdf["ModelNickname"]) == ["naive"]


# ------------------------------------------------- layers_struct
def test_layers_struct_reference_tuples_map(spark, monkeypatch):
    """Reference layers_struct is [('LSTM', {'units': N}), ...]
    (models.py:561-878) — the stack's units now sum onto the numpy
    core's width instead of silently keeping hidden=16."""
    import scalecast_spark.models.mlp as mlp

    seen = {}
    real = mlp.make_direct_rnn

    def fake_make_direct_rnn(lags, hidden, epochs, lr, cell="rnn"):
        seen["hidden"] = hidden
        return real(lags, hidden, 1, lr, cell=cell)

    monkeypatch.setattr(mlp, "make_direct_rnn", fake_make_direct_rnn)
    df = _daily(spark, 40)
    from scalecast_spark.frame import TimeSeriesFrame

    t = TimeSeriesFrame.from_long(df).generate_future_dates(3)
    mlp.rnn_model(
        t.df, lags=5, epochs=1,
        layers_struct=[("LSTM", {"units": 8}), ("LSTM", {"units": 24})],
    ).count()
    assert seen["hidden"] == 32


def test_layers_struct_unmappable_warns(spark, monkeypatch):
    import scalecast_spark.models.mlp as mlp

    real = mlp.make_direct_rnn
    monkeypatch.setattr(
        mlp, "make_direct_rnn",
        lambda lags, hidden, epochs, lr, cell="rnn": real(
            lags, hidden, 1, lr, cell=cell
        ),
    )
    df = _daily(spark, 40)
    from scalecast_spark.frame import TimeSeriesFrame

    t = TimeSeriesFrame.from_long(df).generate_future_dates(3)
    with pytest.warns(UserWarning, match="could not map"):
        mlp.rnn_model(
            t.df, lags=5, epochs=1, layers_struct=[("LSTM", "nope")],
        ).count()


# ------------------------------------------------- numpy metric twins
def test_metric_twin_mape_nan_on_zero_actual():
    """Reference Metrics.py:69-72: NaN, not inf, on any zero actual."""
    from scalecast_spark.util import metrics as m

    assert np.isnan(m.mape([0, 1, 2], [1, 1, 2]))
    assert m.mape([1, 2], [1, 3]) == pytest.approx(0.25)


def test_metric_twin_r2_degenerate_matches_sklearn():
    from scalecast_spark.util import metrics as m

    assert m.r2([3, 3, 3], [3, 3, 3]) == 1.0
    assert m.r2([3, 3, 3], [3, 3, 4]) == 0.0
    assert m.r2([1, 2, 3], [1, 2, 4]) == pytest.approx(0.5)


def test_metric_twins_match_distributed_on_zeros(spark):
    """Twin-vs-oracle property check over arrays containing zeros:
    the numpy twins and the distributed SQL aggregates agree on the
    NaN rules (reference Metrics.py vs functions/metrics.py)."""
    import pandas as pd
    from scalecast_spark.functions import metrics as M
    from scalecast_spark.util import metrics as m

    rng = np.random.default_rng(7)
    a = rng.normal(5, 2, 30)
    a[[3, 17]] = 0.0
    fvals = a + rng.normal(0, 1, 30)
    pdf = pd.DataFrame(
        {"series_id": "s", "y": a, "forecast": fvals}
    )
    sdf = spark.createDataFrame(pdf)
    row = (
        M.evaluate(sdf, actual="y", forecast="forecast", by=["series_id"])
        .toPandas().iloc[0]
    )
    assert np.isnan(m.mape(a, fvals)) and (
        "mape" not in row or pd.isna(row.get("mape"))
        or np.isnan(row.get("mape"))
    )
    assert m.rmse(a, fvals) == pytest.approx(float(row["rmse"]), rel=1e-9)


# ------------------------------------------------- anchored freq densify
def test_missing_vals_weekly_anchored_alias(spark):
    """pd.infer_freq returns 'W-SUN' for weekly data — the densifier
    must use the 7-day grid, not fabricate ~6 daily rows per gap
    (round-15 ADVICE)."""
    from scalecast_spark.operators.impute import Forecaster_with_missing_vals

    dates = pd.date_range("2024-01-07", periods=12, freq="W-SUN")
    keep = [i for i in range(12) if i != 6]  # one missing week
    f = Forecaster_with_missing_vals(
        y=[float(i) for i in keep],
        current_dates=dates[keep],
        fill_strategy="linear_interp",
    )
    obs = f.tsf.observed.toPandas()
    assert len(obs) == 12  # weekly grid, not 78 daily rows
    assert sorted(obs["ds"].dt.date) == sorted(dates.date)


def test_missing_vals_quarterly_anchored_alias(spark):
    from scalecast_spark.operators.impute import Forecaster_with_missing_vals

    dates = pd.date_range("2023-03-31", periods=8, freq="Q-DEC")
    keep = [0, 1, 2, 4, 5, 6, 7]  # one missing quarter
    f = Forecaster_with_missing_vals(
        y=[float(i) for i in keep],
        current_dates=dates[keep],
        fill_strategy="linear_interp",
    )
    obs = f.tsf.observed.toPandas()
    assert len(obs) == 8
    assert sorted(obs["ds"].dt.date) == sorted(dates.date)


def test_missing_vals_unmappable_alias_warns(spark):
    from scalecast_spark.operators.impute import Forecaster_with_missing_vals

    dates = pd.bdate_range("2024-01-01", periods=15)  # 'B' — unmappable
    with pytest.warns(UserWarning, match="no.*calendar-interval mapping"):
        Forecaster_with_missing_vals(
            y=[float(i) for i in range(15)],
            current_dates=dates,
            fill_strategy="ffill",
        )


# ------------------------------------------------- MVForecaster cis
def test_mvforecaster_cis_soundness(spark):
    from scalecast_spark import MVForecaster

    f1 = Forecaster(_daily(spark, 60, sids=("a",), seed=1))
    f2 = Forecaster(_daily(spark, 60, sids=("b",), seed=2))
    with pytest.raises(ValueError, match="test set of at least"):
        MVForecaster(f1, f2, cis=True)  # no test_length → unsound


# ------------------------------------------------- robust LOESS
def _robust_lowess_replica(y, frac, it):
    """Driver-side robust-LOWESS replica (Cleveland bisquare, uniform
    grid closed-form window lo = clamp(i - k//2, 0, n-k)) — written
    independently of functions/smooth.py for numeric parity."""
    y = np.asarray(y, float)
    n = len(y)
    x = np.arange(1.0, n + 1.0)
    k = int(np.clip(np.ceil(frac * n), 2, n))

    def one_pass(rw):
        out = np.empty(n)
        for i in range(n):
            lo = max(0, min(i - k // 2, n - k))
            xw, yw = x[lo:lo + k], y[lo:lo + k]
            d = np.abs(xw - x[i])
            dmax = d.max()
            w = (1 - (d / dmax) ** 3) ** 3 if dmax > 0 else np.ones(k)
            if rw is not None:
                wrw = w * rw[lo:lo + k]
                if wrw.sum() > 0:
                    w = wrw
            sw, sx_, sy_ = w.sum(), (w * xw).sum(), (w * yw).sum()
            sxx, sxy = (w * xw * xw).sum(), (w * xw * yw).sum()
            den = sw * sxx - sx_ * sx_
            b = (sw * sxy - sx_ * sy_) / den
            a = (sy_ - b * sx_) / sw
            out[i] = a + b * x[i]
        return out

    fit = one_pass(None)
    for _ in range(int(it)):
        r = y - fit
        s = np.median(np.abs(r))
        if s <= 0:
            break
        u = np.clip(r / (6.0 * s), -1.0, 1.0)
        fit = one_pass((1.0 - u * u) ** 2)
    return fit


def test_loess_robust_iterations_parity(spark):
    """DetrendTransform(loess=True, it=2) runs REAL Cleveland
    robustness passes (round-15 verdict #6) — numeric parity vs the
    independent replica, and the iterations visibly dampen an
    outlier's pull vs it=0."""
    from pyspark.sql import functions as F

    from scalecast_spark.operators.transforms import DetrendTransform

    rng = np.random.default_rng(11)
    n = 60
    y = 10 + 0.5 * np.arange(n) + rng.normal(0, 1, n)
    y[30] += 40.0  # outlier the robustness pass should shrug off
    pdf = pd.DataFrame({
        SERIES: "a", DS: pd.date_range("2024-01-01", periods=n, freq="D"),
        Y: y,
    })
    df = spark.createDataFrame(pdf).withColumn("is_future", F.lit(0))

    t2 = DetrendTransform(loess=True, frac=0.35, it=2)
    out2 = t2.fit(df).transform(df).orderBy(DS).toPandas()
    expect2 = y - _robust_lowess_replica(y, 0.35, 2)
    np.testing.assert_allclose(
        out2[Y].to_numpy(), expect2, rtol=1e-8, atol=1e-8
    )

    t0 = DetrendTransform(loess=True, frac=0.35, it=0)
    out0 = t0.fit(df).transform(df).orderBy(DS).toPandas()
    # the robust fit follows the outlier less → larger residual there
    assert abs(out2[Y].iloc[30]) > abs(out0[Y].iloc[30])
    # and the two settings genuinely differ
    assert not np.allclose(out2[Y].to_numpy(), out0[Y].to_numpy())


def test_series_transformer_loess_it_no_warning(spark):
    """The 'approximated' warning is gone — it= is real now."""
    from scalecast_spark.series_transformer import SeriesTransformer

    f = Forecaster(_daily(spark, 50), future_dates=5)
    st = SeriesTransformer(f)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        st.DetrendTransform(loess=True, frac=0.4, it=1)


# ------------------------------------------------- combo fitted vals
def test_combo_banks_fitted_values(spark):
    """Reference Combo.generate_current_X (models.py:1568-1583):
    member FittedVals average into the combo's in-sample fitted
    values, trimmed to rows where every member has one; InSample*
    metrics bank alongside."""
    f = Forecaster(_daily(spark, 60), future_dates=5, test_length=6)
    f.set_estimator("naive")
    f.manual_forecast(m=7)
    f.set_estimator("hwes")
    f.manual_forecast(trend=False, seasonal=False, call_me="ses")
    f.combo(["naive", "ses"], call_me="combo")
    fit = f.history["combo"]["fitted"]
    assert fit is not None
    pdf = fit.orderBy(DS).toPandas()
    nv = f.history["naive"]["fitted"].orderBy(DS).toPandas()
    ses = f.history["ses"]["fitted"].orderBy(DS).toPandas()
    merged = nv.merge(ses, on=[SERIES, DS], suffixes=("_n", "_s"))
    merged = merged.dropna(subset=["forecast_n", "forecast_s"])
    assert len(pdf) == len(merged)
    expect = 0.5 * (
        merged["forecast_n"].to_numpy() + merged["forecast_s"].to_numpy()
    )
    np.testing.assert_allclose(
        pdf["forecast"].to_numpy(), expect, rtol=1e-9
    )
    assert "InSampleRMSE" in f.history["combo"]["summary"]


def test_combo_excludes_fitted_less_members(spark):
    """exclude_models_with_no_fvs=True (reference default) drops a
    fitted-less member from the in-sample average (weights
    renormalized over the survivors); False refuses to produce fitted
    values unless every member has them."""
    f = Forecaster(_daily(spark, 60), future_dates=5, test_length=6)
    f.set_estimator("naive")
    f.manual_forecast(m=7)
    f.set_estimator("hwes")
    f.manual_forecast(trend=False, seasonal=False, call_me="ses")
    f.synthesize_models(["naive", "ses"], call_me="nofvs")  # fitted=None
    f.combo(["naive", "nofvs"], call_me="cx")
    fit = f.history["cx"]["fitted"].orderBy(DS).toPandas()
    nv = f.history["naive"]["fitted"].orderBy(DS).toPandas().dropna(
        subset=["forecast"]
    )
    np.testing.assert_allclose(
        fit["forecast"].to_numpy(), nv["forecast"].to_numpy(), rtol=1e-9
    )
    f.combo(
        ["naive", "nofvs"], call_me="cn", exclude_models_with_no_fvs=False,
    )
    assert f.history["cn"]["fitted"] is None
