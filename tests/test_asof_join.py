"""asof_join (operators/joins.py) vs pandas merge_asof — the
authoritative reference implementation — on randomized per-key
irregular timestamps, all directions, with and without tolerance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.operators.joins import asof_join


def _frames(spark, seed=0, n_keys=4, n_left=40, n_right=25):
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01")
    lrows, rrows = [], []
    for k in range(n_keys):
        kid = f"k{k}"
        lts = np.sort(rng.choice(20000, size=n_left, replace=False))
        rts = np.sort(rng.choice(20000, size=n_right, replace=False))
        for t in lts:
            lrows.append((kid, base + pd.Timedelta(minutes=int(t)),
                          float(rng.randn())))
        for t in rts:
            rrows.append((kid, base + pd.Timedelta(minutes=int(t)),
                          float(rng.randn()), int(rng.randint(100))))
    lpd = pd.DataFrame(lrows, columns=["series_id", "ds", "y"])
    rpd = pd.DataFrame(rrows, columns=["series_id", "ds", "price", "qty"])
    return (
        lpd, rpd,
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
    )


def _expected(lpd, rpd, direction, tolerance=None):
    kw = {"by": "series_id", "on": "ds", "direction": direction}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(tolerance)
    return (
        pd.merge_asof(
            lpd.sort_values("ds"), rpd.sort_values("ds"), **kw
        )
        .sort_values(["series_id", "ds"])
        .reset_index(drop=True)
    )


def _got(sdf):
    return (
        sdf.toPandas()
        .sort_values(["series_id", "ds"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    lpd, rpd, sl, sr = _frames(spark, seed=7)
    want = _expected(lpd, rpd, direction)
    got = _got(asof_join(sl, sr, direction=direction))
    assert len(got) == len(want)
    for c in ["price", "qty"]:
        g, w = got[c], want[c]
        assert (g.isna() == w.isna()).all(), c
        assert np.allclose(g.dropna(), w.dropna(), atol=0), c


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance_matches_pandas(spark, direction):
    lpd, rpd, sl, sr = _frames(spark, seed=11)
    want = _expected(lpd, rpd, direction, tolerance="45 minutes")
    got = _got(asof_join(sl, sr, direction=direction,
                         tolerance="45 minutes"))
    g, w = got["price"], want["price"]
    assert (g.isna() == w.isna()).all()
    assert np.allclose(g.dropna(), w.dropna(), atol=0)
    # numeric seconds spelling agrees with the interval spelling
    got2 = _got(asof_join(sl, sr, direction=direction, tolerance=45 * 60))
    assert (got2["price"].isna() == w.isna()).all()


def test_asof_exact_tie_is_inclusive(spark):
    """A right reading AT the left timestamp matches (merge_asof
    default allow_exact_matches=True), in both directions."""
    l = spark.createDataFrame(
        [("a", pd.Timestamp("2024-01-02"), 1.0)], ["series_id", "ds", "y"]
    )
    r = spark.createDataFrame(
        [("a", pd.Timestamp("2024-01-02"), 42.0)],
        ["series_id", "ds", "price"],
    )
    for d in ("backward", "forward"):
        row = asof_join(l, r, direction=d).collect()[0]
        assert row["price"] == 42.0, d


def test_asof_validation_and_suffix(spark):
    l = spark.createDataFrame(
        [("a", pd.Timestamp("2024-01-02"), 1.0)], ["series_id", "ds", "y"]
    )
    r = spark.createDataFrame(
        [("a", pd.Timestamp("2024-01-01"), 2.0)], ["series_id", "ds", "y"]
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r)
    out = asof_join(l, r, suffix="_x").collect()[0]
    assert out["y"] == 1.0 and out["y_x"] == 2.0
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, direction="nearest", suffix="_x")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(l, r.withColumnRenamed("series_id", "k"), suffix="_x")


def test_asof_plan_has_no_range_join(spark):
    """Scale pin: the plan is union + ONE window partitioned by key —
    no BroadcastNestedLoopJoin / cartesian, no theta join."""
    lpd, rpd, sl, sr = _frames(spark, seed=3, n_keys=2)
    plan = asof_join(sl, sr)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_strict_matches_pandas(spark, direction):
    """allow_exact_matches=False: a right reading exactly AT the left
    timestamp is excluded (strict inequality), matching pandas."""
    lpd, rpd, sl, sr = _frames(spark, seed=21)
    # force some exact collisions so the flag actually bites
    rpd2 = (
        pd.concat([rpd, lpd.rename(columns={"y": "price"}).assign(qty=7)])
        .drop_duplicates(["series_id", "ds"], keep="last")
        .reset_index(drop=True)
    )  # unique (key, ts): duplicate right timestamps are tie-ambiguous
    sr2 = spark.createDataFrame(rpd2[["series_id", "ds", "price", "qty"]])
    want = (
        pd.merge_asof(
            lpd.sort_values("ds"),
            rpd2[["series_id", "ds", "price", "qty"]].sort_values("ds"),
            by="series_id", on="ds", direction=direction,
            allow_exact_matches=False,
        )
        .sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    got = _got(asof_join(sl, sr2, direction=direction,
                         allow_exact_matches=False))
    g, w = got["price"], want["price"]
    assert (g.isna() == w.isna()).all()
    assert np.allclose(g.dropna(), w.dropna(), atol=0)


def test_asof_multi_key_by(spark):
    """Multi-column by: matches stay inside the full composite key."""
    base = pd.Timestamp("2024-01-01")
    l = spark.createDataFrame(
        [("a", "x", base + pd.Timedelta(days=2)),
         ("a", "z", base + pd.Timedelta(days=2))],
        ["k1", "k2", "ds"],
    )
    r = spark.createDataFrame(
        [("a", "x", base, 1.0), ("a", "z", base + pd.Timedelta(days=1), 2.0)],
        ["k1", "k2", "ds", "v"],
    )
    got = {
        (row["k1"], row["k2"]): row["v"]
        for row in asof_join(l, r, by=["k1", "k2"]).collect()
    }
    assert got == {("a", "x"): 1.0, ("a", "z"): 2.0}


def test_asof_join_stream_parity_and_resume_contract(spark, tmp_path):
    """Streamed asof == batch asof by construction (each left row's
    match depends only on the static right side, so micro-batch
    splits cannot change it) — verified across a 2-batch AvailableNow
    drain; the exactly-once sink contract refuses a results_path with
    no matching checkpoint marker."""
    import time as _time

    from scalecast_spark.streaming.ops import asof_join_stream

    lpd, rpd, sl, _ = _frames(spark, seed=5, n_keys=3)
    src = str(tmp_path / "left_src")
    cut = lpd["ds"].median()
    spark.createDataFrame(lpd[lpd["ds"] <= cut]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(lpd[lpd["ds"] > cut]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    rpath = str(tmp_path / "right")
    spark.createDataFrame(rpd).write.parquet(rpath)

    stream = (
        spark.readStream.schema("series_id string, ds timestamp, y double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    res, ckpt = str(tmp_path / "res"), str(tmp_path / "ckpt")
    got = (
        asof_join_stream(stream, rpath, res, ckpt, tolerance="2 hours")
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    want = (
        asof_join(sl, spark.read.parquet(rpath), tolerance="2 hours")
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    assert len(got) == len(lpd)
    for c in ["price", "qty"]:
        assert (got[c].isna() == want[c].isna()).all(), c
        assert np.allclose(got[c].dropna(), want[c].dropna(), atol=0), c
    # sink contract: results without a matching checkpoint marker refuse
    with pytest.raises(FileExistsError, match="results_path"):
        asof_join_stream(stream, rpath, res, str(tmp_path / "ckpt2"))
