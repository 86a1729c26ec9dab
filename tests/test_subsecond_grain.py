"""Sub-second timestamp arithmetic (round-12 precision fix).

The reference degrades to a NANOSECOND-frequency pandas index for
tick-grain data (SURVEY.md §1.2); the engine's old ``unix_timestamp``
math truncated to whole seconds, so millisecond series saw zero-length
gaps, wrong interpolation weights, and spurious tolerance decisions.
These tests pin the cast-based replacement at millisecond grain
against pandas (merge_asof / manual math), plus the numeric-on-column
asof path (ADVICE r11: unix_timestamp on numerics returned NULL and
silently voided every match).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.frame import TimeSeriesFrame
from scalecast_spark.operators.impute import densify, linear_interp
from scalecast_spark.operators.joins import asof_join
from scalecast_spark.operators.sessions import sessionize
from scalecast_spark.functions.seasonal import modal_gap_seconds


def _ms_frames(spark, seed=3, n_keys=3, n_left=30, n_right=20):
    """Irregular millisecond-grain timestamps (distinct ms offsets in a
    2-second window, so every gap is fractional)."""
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01")
    lrows, rrows = [], []
    for k in range(n_keys):
        kid = f"k{k}"
        lts = np.sort(rng.choice(2000, size=n_left, replace=False))
        rts = np.sort(rng.choice(2000, size=n_right, replace=False))
        for t in lts:
            lrows.append((kid, base + pd.Timedelta(milliseconds=int(t)),
                          float(rng.randn())))
        for t in rts:
            rrows.append((kid, base + pd.Timedelta(milliseconds=int(t)),
                          float(rng.randn())))
    lpd = pd.DataFrame(lrows, columns=["series_id", "ds", "y"])
    rpd = pd.DataFrame(rrows, columns=["series_id", "ds", "price"])
    return lpd, rpd, spark.createDataFrame(lpd), spark.createDataFrame(rpd)


def _sorted(df):
    return df.sort_values(["series_id", "ds"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tol", ["500 milliseconds", 0.5])
def test_asof_ms_tolerance_matches_pandas(spark, direction, tol):
    lpd, rpd, sl, sr = _ms_frames(spark)
    want = _sorted(pd.merge_asof(
        lpd.sort_values("ds"), rpd.sort_values("ds"),
        by="series_id", on="ds", direction=direction,
        tolerance=pd.Timedelta("500 milliseconds"),
    ))
    got = _sorted(
        asof_join(sl, sr, direction=direction, tolerance=tol).toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the old whole-second truncation made every <1s gap "0", so a
    # 500ms tolerance never voided anything — prove some match is
    # actually voided at ms grain
    assert got["price"].isna().sum() > 0


def test_asof_numeric_on_column_matches_pandas(spark):
    """pandas merge_asof supports a numeric on-column; unix_timestamp
    on numerics is NULL, which used to silently void every match."""
    rng = np.random.RandomState(11)
    lpd = pd.DataFrame({
        "series_id": ["a"] * 25,
        "ds": np.sort(rng.choice(10_000, size=25, replace=False)).astype("int64"),
        "y": rng.randn(25),
    })
    rpd = pd.DataFrame({
        "series_id": ["a"] * 15,
        "ds": np.sort(rng.choice(10_000, size=15, replace=False)).astype("int64"),
        "price": rng.randn(15),
    })
    want = _sorted(pd.merge_asof(
        lpd.sort_values("ds"), rpd.sort_values("ds"),
        by="series_id", on="ds", tolerance=800,
    ))
    got = _sorted(asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd), tolerance=800
    ).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["price"].notna().sum() > 0  # matches not silently nulled


def test_asof_numeric_on_rejects_interval_tolerance(spark):
    lpd = pd.DataFrame({"series_id": ["a"], "ds": [1], "y": [0.0]})
    rpd = pd.DataFrame({"series_id": ["a"], "ds": [0], "price": [1.0]})
    with pytest.raises(ValueError, match="numeric"):
        asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                  tolerance="1 day")


def test_sessionize_subsecond_gaps(spark):
    """gap=0.5s splits a 0.9s jump but not a 0.2s one — whole-second
    truncation saw both gaps as 0 and fused everything."""
    base = pd.Timestamp("2024-01-01")
    offsets_ms = [0, 200, 350, 1250, 1400, 3000]
    pdf = pd.DataFrame({
        "user_id": ["u1"] * len(offsets_ms),
        "ts": [base + pd.Timedelta(milliseconds=m) for m in offsets_ms],
        "value": 1.0,
    })
    out = (
        sessionize(spark.createDataFrame(pdf), gap_seconds=0.5)
        .orderBy("ts").select("session_id").toPandas()["session_id"].tolist()
    )
    assert out == [1, 1, 1, 2, 2, 3]


def test_linear_interp_ms_weights(spark):
    """Interpolation weight = time fraction at ms grain: brackets at
    t=0ms (y=0) and t=1000ms (y=10), gap at t=250ms -> 2.5 (the old
    unix_timestamp weights collapsed to 0/0 within one second)."""
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "series_id": ["s"] * 3,
        "ds": [base, base + pd.Timedelta(milliseconds=250),
               base + pd.Timedelta(seconds=1)],
        "y": [0.0, None, 10.0],
    })
    out = linear_interp(spark.createDataFrame(pdf)).orderBy("ds").toPandas()
    assert out["y"].tolist() == pytest.approx([0.0, 2.5, 10.0])


def test_infer_freq_and_future_dates_ms(spark):
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "series_id": ["s"] * 9,
        "ds": [base + pd.Timedelta(milliseconds=250 * i) for i in range(9)],
        "y": np.arange(9, dtype="float64"),
    })
    tsf = TimeSeriesFrame.from_long(spark.createDataFrame(pdf))
    assert tsf.freq_seconds == pytest.approx(0.25)
    assert modal_gap_seconds(tsf.df) == pytest.approx(0.25)
    fut = tsf.generate_future_dates(4).future.orderBy("ds").toPandas()
    want = [base + pd.Timedelta(milliseconds=250 * (8 + i)) for i in range(1, 5)]
    assert list(fut["ds"]) == want


def test_densify_subsecond_grid(spark):
    base = pd.Timestamp("2024-01-01")
    # observations at 0ms and 1000ms with 250ms frequency -> 5 grid rows
    pdf = pd.DataFrame({
        "series_id": ["s", "s"],
        "ds": [base, base + pd.Timedelta(seconds=1)],
        "y": [1.0, 2.0],
    })
    out = densify(spark.createDataFrame(pdf), freq_seconds=0.25)
    rows = out.orderBy("ds").toPandas()
    assert len(rows) == 5
    assert rows["y"].isna().sum() == 3
    deltas = rows["ds"].diff().dropna().unique()
    assert all(d == pd.Timedelta(milliseconds=250) for d in deltas)
    with pytest.raises(ValueError):
        densify(spark.createDataFrame(pdf), freq_seconds=0)


def test_epoch_seconds_sweep_vs_pandas(spark):
    """epoch_seconds == pandas nanosecond epoch / 1e9 (to the
    microsecond Spark stores) across representative instants:
    pre-epoch (negative), whole seconds, odd microseconds, far
    future."""
    from scalecast_spark.functions.timegrain import (
        epoch_seconds,
        interval_seconds,
    )

    stamps = [
        pd.Timestamp("1969-12-31 23:59:59.000001"),
        pd.Timestamp("1970-01-01 00:00:00"),
        pd.Timestamp("1970-01-01 00:00:00.250000"),
        pd.Timestamp("2024-02-29 12:34:56.789123"),
        pd.Timestamp("2038-01-19 03:14:07.999999"),
        pd.Timestamp("2124-06-01 00:00:00.000001"),
    ]
    pdf = pd.DataFrame({"ts": stamps})
    got = [
        r[0]
        for r in spark.createDataFrame(pdf)
        .select(epoch_seconds("ts"))
        .collect()
    ]
    want = [s.value / 1e9 for s in stamps]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=5e-7), (g, w)
    # interval_seconds: sub-second intervals no longer truncate to 0
    rows = spark.range(1).select(
        interval_seconds("500 milliseconds").alias("ms"),
        interval_seconds("2 days").alias("d"),
        interval_seconds("1 minute 30 seconds").alias("m"),
    ).collect()[0]
    assert rows["ms"] == pytest.approx(0.5)
    assert rows["d"] == pytest.approx(172800.0)
    assert rows["m"] == pytest.approx(90.0)


def test_pipeline_accepts_forecaster_objects(spark):
    """Reference pipelines take Forecaster objects; the engine's
    accept them too (the long frame is extracted)."""
    from scalecast_spark import Forecaster, MVPipeline, Transformer, Reverter
    from scalecast_spark.models import MODELS
    from scalecast_spark.operators import transforms as tr
    from functools import partial

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "series_id": ["s"] * 30,
        "ds": [base + pd.Timedelta(days=i) for i in range(30)],
        "y": [10.0 + (i % 7) for i in range(30)],
    })
    f = Forecaster(spark.createDataFrame(pdf))
    t = Transformer([tr.LogTransform()])
    p = MVPipeline(steps=[("T", t), ("M", partial(MODELS["naive"], m=7)),
                          ("R", Reverter(t))])
    out = p.fit_predict(f)  # Forecaster in, frame out
    assert "forecast" in out.columns
    bt = p.backtest(f, fcst_length=3, n_iter=2)
    assert bt.count() == 2 * 3


def test_asof_join_stream_ms_tolerance(spark, tmp_path):
    """The streaming twin inherits the sub-second fix: a millisecond
    tolerance voids stale matches across an AvailableNow drain exactly
    like the batch operator (which is merge_asof-parity-tested
    above)."""
    from scalecast_spark.streaming.ops import asof_join_stream

    lpd, rpd, sl, sr = _ms_frames(spark, seed=9, n_keys=2, n_left=20,
                                  n_right=10)
    src = str(tmp_path / "left_src")
    cut = lpd["ds"].median()
    spark.createDataFrame(lpd[lpd["ds"] <= cut]).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(lpd[lpd["ds"] > cut]).coalesce(1).write.mode(
        "append").parquet(src)
    rpath = str(tmp_path / "right")
    spark.createDataFrame(rpd).write.parquet(rpath)
    stream = (
        spark.readStream.schema("series_id string, ds timestamp, y double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = _sorted(asof_join_stream(
        stream, rpath, str(tmp_path / "res"), str(tmp_path / "ckpt"),
        tolerance="500 milliseconds",
    ).toPandas())
    want = _sorted(
        asof_join(sl, sr, tolerance="500 milliseconds").toPandas()
    )
    assert len(got) == len(want) == len(lpd)
    assert (got["price"].isna() == want["price"].isna()).all()
    assert np.allclose(got["price"].dropna(), want["price"].dropna())
    assert got["price"].isna().sum() > 0  # the ms tolerance actually bites
