"""Stat tests / dynamic intervals / missing-vals constructor."""

from functools import partial

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.functions import stattests as ST
from scalecast_spark.functions import intervals as IV
from scalecast_spark.operators import impute as IMP
from scalecast_spark.pipeline import backtest
from scalecast_spark.models import MODELS
from scalecast_spark.sources import load_table, events_to_series


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    return events_to_series(load_table(spark, sf_dir, "events")).cache()


def _mk(spark, y, sid="s"):
    return spark.createDataFrame(
        pd.DataFrame({
            SERIES: [sid] * len(y),
            DS: pd.date_range("2024-01-01", periods=len(y)),
            Y: y,
        })
    )


def test_adf_random_walk_vs_stationary(spark):
    rng = np.random.RandomState(7)
    walk = _mk(spark, np.cumsum(rng.randn(300)), "walk")
    stat = _mk(spark, rng.randn(300), "white")
    res = {r[SERIES]: r for r in ST.adf_test(walk.union(stat)).collect()}
    assert not res["walk"]["stationary_5pct"]
    assert res["white"]["stationary_5pct"]
    assert res["white"]["adf_stat"] < res["walk"]["adf_stat"]


def test_normality_test_gaussian_vs_uniform(spark):
    rng = np.random.RandomState(3)
    g = _mk(spark, rng.randn(800), "gauss")
    u = _mk(spark, rng.uniform(-1, 1, 800), "unif")
    res = {r[SERIES]: r for r in ST.normality_test(g.union(u)).collect()}
    assert res["gauss"]["pvalue"] > 0.05
    assert res["unif"]["pvalue"] < 0.01


def test_periodogram_finds_dominant_frequency(spark):
    t = np.arange(256)
    y = np.sin(2 * np.pi * t / 8.0)  # period 8 → freq 0.125
    df = _mk(spark, y)
    pdf = ST.periodogram(df).toPandas()
    top = pdf.loc[pdf["power"].idxmax()]
    assert top["freq"] == pytest.approx(0.125, abs=1e-6)


def test_seasonal_decompose_recovers_components(spark):
    t = np.arange(140)
    season = np.tile([0.0, 3.0, -1.0, 2.0, -4.0, 1.0, -1.0], 20)
    y = 0.5 * t + season + 10
    df = _mk(spark, y)
    out = ST.seasonal_decompose(df, m=7).toPandas().sort_values(DS)
    mid = out.dropna(subset=["trend"])
    # trend ~ linear, seasonal ~ planted profile, resid ~ 0
    assert np.allclose(mid["resid"], 0, atol=1e-6)
    got_season = mid.groupby(mid.index % 7)["seasonal"].first()
    assert np.allclose(sorted(got_season), sorted(season[:7] - season[:7].mean()), atol=1e-6)


def test_stepwise_intervals_widen(series):
    df = series.withColumn("is_future", F.lit(0))
    res = backtest(df, {"snaive": partial(MODELS["naive"], m=7)},
                   fcst_length=7, n_iter=4, jump_back=3)
    steps = IV.backtest_resid_steps(res)
    widths = IV.stepwise_widths(steps, cilevel=0.9)
    pdf = widths.toPandas()
    assert set(pdf["step"]) == set(range(1, 8))
    # step-wise widths vary by step (flat-band conformal cannot do this)
    per_series = pdf.groupby(SERIES)["ci_range"].nunique()
    assert (per_series > 1).all()


def test_missing_vals_constructor_spot_values(spark):
    # reference test_util.py:16,30 — 1,2,NULL,4 interpolates to 3
    pdf = pd.DataFrame({
        SERIES: ["s"] * 4,
        DS: pd.date_range("2024-01-01", periods=4),
        Y: [1.0, 2.0, None, 4.0],
    })
    df = spark.createDataFrame(pdf)
    tsf = IMP.frame_with_missing_vals(df, fill_strategy="linear_interp")
    got = {r[DS].day: r[Y] for r in tsf.df.collect()}
    assert got[3] == pytest.approx(3.0)

    # clamp + seasonal fill path
    tsf2 = IMP.frame_with_missing_vals(
        df, fill_strategy="moving_average", floor=1.5, cap=3.0, window=2
    )
    vals = [r[Y] for r in tsf2.df.orderBy(DS).collect()]
    assert min(vals) >= 1.5 and max(vals) <= 3.0


def test_moving_seasonal_average_fill(spark):
    # weekly pattern; hole at a phase with known history
    y = [10.0, 20.0] * 6
    y[8] = None  # phase 0, prior phase-0 values are all 10
    pdf = pd.DataFrame({
        SERIES: ["s"] * 12,
        DS: pd.date_range("2024-01-01", periods=12),
        Y: y,
    })
    out = IMP.fill_moving_seasonal_average(spark.createDataFrame(pdf), m=2, seasons_back=3)
    row = out.orderBy(DS).collect()[8]
    assert row[Y] == pytest.approx(10.0)


def test_impute_pool_fill(spark):
    # reference util.py:1117-1118 — NULLs get a draw from the pool
    pdf = pd.DataFrame({
        SERIES: ["s"] * 6,
        DS: pd.date_range("2024-01-01", periods=6),
        Y: [1.0, None, 3.0, None, 5.0, None],
    })
    df = spark.createDataFrame(pdf)
    pool = [100.0, 200.0, 300.0]
    out1 = IMP.fill_pool(df, pool, seed=42).orderBy(DS).collect()
    out2 = IMP.fill_pool(df, pool, seed=42).orderBy(DS).collect()
    # observed values untouched
    assert [r[Y] for r in out1][::2] == [1.0, 3.0, 5.0]
    # filled values come from the pool, deterministically
    filled = [r[Y] for r in out1][1::2]
    assert all(v in pool for v in filled)
    assert [r[Y] for r in out1] == [r[Y] for r in out2]
    # registry + constructor path
    tsf = IMP.frame_with_missing_vals(
        df, fill_strategy="impute_pool", value_pool=pool
    )
    vals = [r[Y] for r in tsf.df.orderBy(DS).collect()]
    assert all(v is not None for v in vals)


def test_noise_pool_and_simhash_bits_guard(spark):
    pdf = pd.DataFrame({
        SERIES: ["s"] * 3,
        DS: pd.date_range("2024-01-01", periods=3),
        Y: [1.0, 2.0, 3.0],
    })
    df = spark.createDataFrame(pdf)
    out = IMP.add_noise_pool(df, [10.0], seed=1).orderBy(DS).collect()
    assert [r[Y] for r in out] == [11.0, 12.0, 13.0]

    from scalecast_spark.datapipe import dedup

    # bits=64 (the old default) clamps to 60 with a warning (ADVICE r2
    # compat shim — see test_round2_fixes for value identity); >64 raises
    with pytest.warns(UserWarning, match="clamped to 60"):
        dedup.simhash(df.withColumnRenamed(Y, "text").withColumn(
            "doc_id", F.lit(1)
        ).withColumn("text", F.col("text").cast("string")), bits=64)
    with pytest.raises(ValueError, match="at most 64 bits"):
        dedup.simhash(df, bits=65)
