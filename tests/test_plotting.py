"""Plot surface tests (reference Forecaster.py:1320-2063): the plot
DATA is checked against independent numpy implementations; the render
path is exercised headless (matplotlib absent -> warn + return None,
frame still produced)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark import plotting as P
from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.sources import events_to_series, load_table


def _np_acf(y, nlags):
    y = np.asarray(y, float)
    d = y - y.mean()
    c0 = float(d @ d)
    return [1.0] + [float(d[k:] @ d[:-k]) / c0 for k in range(1, nlags + 1)]


def _np_pacf(y, nlags):
    """Independent check: PACF lag k = last Yule-Walker coefficient of
    the order-k AR fit on the biased ACF (solved directly, not via the
    Durbin-Levinson recursion the library uses)."""
    rho = np.asarray(_np_acf(y, nlags))
    out = [1.0]
    for k in range(1, nlags + 1):
        R = np.array([[rho[abs(i - j)] for j in range(k)] for i in range(k)])
        out.append(float(np.linalg.solve(R, rho[1 : k + 1])[-1]))
    return out


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for sid, phi in [("a", 0.8), ("b", -0.5)]:
        y = [0.0]
        for _ in range(59):
            y.append(phi * y[-1] + rng.normal())
        for i, v in enumerate(y):
            rows.append((sid, pd.Timestamp("2024-01-01") + pd.Timedelta(days=i), float(v)))
    pdf = pd.DataFrame(rows, columns=[SERIES, DS, Y])
    return spark.createDataFrame(pdf), {
        sid: pdf[pdf[SERIES] == sid].sort_values(DS)[Y].to_numpy()
        for sid in ("a", "b")
    }


def test_acf_matches_numpy(toy):
    df, ys = toy
    got = P.acf_frame(df, nlags=6).toPandas()
    for sid, y in ys.items():
        exp = np.round(_np_acf(y, 6), 6)
        sub = got[got[SERIES] == sid].sort_values("lag")["acf"].to_numpy()
        assert np.allclose(sub, exp, atol=1e-6), sid


def test_pacf_matches_yule_walker(toy):
    df, ys = toy
    got = P.pacf_frame(df, nlags=5).toPandas()
    for sid, y in ys.items():
        exp = np.round(_np_pacf(y, 5), 6)
        sub = got[got[SERIES] == sid].sort_values("lag")["pacf"].to_numpy()
        assert np.allclose(sub, exp, atol=1e-5), sid
    # AR(1) signature: pacf(1) dominates, pacf(>=2) near zero
    a = got[got[SERIES] == "a"].sort_values("lag")["pacf"].to_numpy()
    assert abs(a[1]) > 0.5 and all(abs(v) < 0.35 for v in a[2:])


def test_acf_diffy_and_train_only(toy):
    df, ys = toy
    got = P.acf_frame(df, nlags=3, diffy=True).toPandas()
    exp = np.round(_np_acf(np.diff(ys["a"]), 3), 6)
    sub = got[got[SERIES] == "a"].sort_values("lag")["acf"].to_numpy()
    assert np.allclose(sub, exp, atol=1e-6)
    chopped = P.acf_frame(
        df, nlags=3, train_only=True, test_length=10
    ).toPandas()
    exp2 = np.round(_np_acf(ys["a"][:-10], 3), 6)
    sub2 = chopped[chopped[SERIES] == "a"].sort_values("lag")["acf"].to_numpy()
    assert np.allclose(sub2, exp2, atol=1e-6)


def test_constant_series_yields_null_acf_not_job_failure(spark, toy):
    """A zero-variance series has an undefined ACF: it must come back
    as NULL rows, and must NOT kill the job for the other series
    (ANSI DIVIDE_BY_ZERO at scale = one degenerate series fails a
    million-series correlogram)."""
    df, ys = toy
    const = spark.createDataFrame(
        pd.DataFrame(
            {
                SERIES: ["flat"] * 10,
                DS: pd.date_range("2024-01-01", periods=10),
                Y: [5.0] * 10,
            }
        )
    )
    both = df.unionByName(const)
    got = P.acf_frame(both, nlags=3).toPandas()
    flat = got[got[SERIES] == "flat"]
    assert len(flat) == 4 and flat["acf"].isna().all()
    ok = got[got[SERIES] == "a"].sort_values("lag")["acf"].to_numpy()
    assert np.allclose(ok, np.round(_np_acf(ys["a"], 3), 6), atol=1e-6)
    # pacf propagates the undefined statistic as NULL at EVERY lag
    # (round 6: including lag 0, mirroring the acf member — a
    # hardcoded 1.0 there would diverge from the SQL oracle's NULL)
    pflat = P.pacf_frame(const, nlags=3).toPandas()
    assert pflat["pacf"].isna().all()


def test_acf_bartlett_confidence(toy):
    df, ys = toy
    got = P.acf_frame(df, nlags=5, alpha=0.05).toPandas()
    z = 1.959963984540054
    for sid, y in ys.items():
        rho = np.asarray(_np_acf(y, 5))
        n = len(y)
        exp = [0.0] + [
            z * np.sqrt((1.0 + 2.0 * float((rho[1:k] ** 2).sum())) / n)
            for k in range(1, 6)
        ]
        sub = got[got[SERIES] == sid].sort_values("lag")["conf"].to_numpy()
        assert np.allclose(sub, exp, atol=1e-4), sid


def test_pacf_confidence_constant(toy):
    df, ys = toy
    got = P.pacf_frame(df, nlags=4, alpha=0.05).toPandas()
    sub = got[got[SERIES] == "a"].sort_values("lag")["conf"].to_numpy()
    n = len(ys["a"])
    assert sub[0] == 0.0
    assert np.allclose(sub[1:], 1.959963984540054 / np.sqrt(n), atol=1e-5)


@pytest.fixture(scope="module")
def fitted_f(spark, sf_dir):
    series = events_to_series(load_table(spark, sf_dir, "events"))
    fc = Forecaster(series, future_dates=5)
    fc.set_test_length(5)
    fc.add_ar_terms(2).add_time_trend()
    fc.set_estimator("naive").manual_forecast(call_me="naive")
    fc.set_estimator("mlr").manual_forecast()
    return fc


def test_forecast_plot_frame_shape(fitted_f):
    n_series = fitted_f.tsf.df.select(SERIES).distinct().count()
    frame = fitted_f.plot(ci=True, render=False)
    counts = {
        r["model"]: r["count"]
        for r in frame.groupBy("model").count().collect()
    }
    assert counts["naive"] == 5 * n_series
    assert counts["mlr"] == 5 * n_series
    assert counts["actuals"] > counts["mlr"]
    # conformal bands ride along for models that banked them
    with_ci = frame.filter(
        (F.col("model") == "mlr") & F.col("upper").isNotNull()
    ).count()
    assert with_ci == 5 * n_series
    assert (
        frame.filter(
            (F.col("model") == "actuals") & F.col("upper").isNotNull()
        ).count()
        == 0
    )


def test_test_set_and_fitted_frames(fitted_f):
    n_series = fitted_f.tsf.df.select(SERIES).distinct().count()
    ts = fitted_f.plot_test_set(include_train=False, render=False)
    counts = {
        r["model"]: r["count"] for r in ts.groupBy("model").count().collect()
    }
    assert counts["actuals"] == 5 * n_series
    assert counts["mlr"] == 5 * n_series
    fit = fitted_f.plot_fitted(models=["mlr"], render=False)
    assert fit.filter(F.col("model") == "mlr").count() > 0


def test_render_gated_headless(fitted_f, tmp_path, recwarn):
    """matplotlib is absent in this container: render=True must warn,
    skip drawing, and still hand back the data frame."""
    frame = fitted_f.plot(render=True, path=str(tmp_path / "p.png"))
    assert frame.count() > 0
    assert not (tmp_path / "p.png").exists()
    assert any("matplotlib" in str(w.message) for w in recwarn.list)
    fig = P.render_lines(frame)
    assert fig is None or hasattr(fig, "savefig")


def test_periodogram_plot_frame(fitted_f):
    frame = fitted_f.plot_periodogram(render=False)
    pdf = frame.toPandas()
    assert {"freq", "power"} <= set(pdf.columns)
    assert (pdf["power"] >= 0).all()
