"""Online auto-compaction for the foreachBatch exactly-once sinks
(r11 verdict: one ``batch_id=<n>`` directory per micro-batch
accumulates without bound; ``compact_results`` existed but was
manual). ``compact_every=N`` collapses every committed window of N
batch directories into one — crash-safe via a staging manifest —
without breaking the resume contract or exactly-once. Plus the
crash-window resume test asof_join_stream was missing (r11 verdict
item 7)."""

import os
import time as _time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark.operators.joins import asof_join
from scalecast_spark.streaming.ops import (
    _auto_compact_sink,
    _finish_pending_compactions,
    _list_batch_ids,
    asof_join_stream,
)


def _mk_frames(spark, n_keys=2, n_left=60, n_right=10, seed=1):
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01")
    lrows, rrows = [], []
    for k in range(n_keys):
        kid = f"k{k}"
        for t in np.sort(rng.choice(50_000, size=n_left, replace=False)):
            lrows.append((kid, base + pd.Timedelta(minutes=int(t)),
                          float(rng.randn())))
        for t in np.sort(rng.choice(50_000, size=n_right, replace=False)):
            rrows.append((kid, base + pd.Timedelta(minutes=int(t)),
                          float(rng.randn())))
    lpd = pd.DataFrame(lrows, columns=["series_id", "ds", "y"])
    rpd = pd.DataFrame(rrows, columns=["series_id", "ds", "price"])
    return lpd, rpd


def _n_batch_dirs(path):
    if not os.path.isdir(path):
        return 0
    return sum(1 for d in os.listdir(path) if d.startswith("batch_id="))


def _drive(spark, tmp_path, lpd, rpd, n_files, compact_every,
           res="res", ckpt="ckpt"):
    """Drain ``n_files`` single-file micro-batches through
    asof_join_stream with online compaction."""
    src = str(tmp_path / "left_src")
    chunks = np.array_split(lpd.sort_values("ds").reset_index(drop=True),
                            n_files)
    for ch in chunks:
        spark.createDataFrame(ch).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(0.05)
    rpath = str(tmp_path / "right")
    if not os.path.isdir(rpath):
        spark.createDataFrame(rpd).write.parquet(rpath)
    stream = (
        spark.readStream.schema("series_id string, ds timestamp, y double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return asof_join_stream(
        stream, rpath, str(tmp_path / res), str(tmp_path / ckpt),
        tolerance="6 hours", compact_every=compact_every,
    )


def test_long_stream_bounded_dirs_and_parity(spark, tmp_path):
    """A 20-micro-batch drain with compact_every=5 must end at
    ceil(20/5)=4 result directories with exactly the batch answer —
    no lost rows, no duplicates."""
    lpd, rpd = _mk_frames(spark)
    got = (
        _drive(spark, tmp_path, lpd, rpd, n_files=20, compact_every=5)
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    res = str(tmp_path / "res")
    assert _n_batch_dirs(res) <= 4
    want = (
        asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                  tolerance="6 hours")
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    assert len(got) == len(want) == len(lpd)
    assert (got["price"].isna() == want["price"].isna()).all()
    assert np.allclose(got["price"].dropna(), want["price"].dropna())


def test_compacted_stream_still_resumes(spark, tmp_path):
    """Resume after a compacted drain: new batches get fresh ids, old
    windows stay compacted, and the union equals the one-shot batch
    answer."""
    lpd, rpd = _mk_frames(spark, n_left=40)
    first = lpd.iloc[: len(lpd) // 2]
    second = lpd.iloc[len(lpd) // 2:]
    got1 = _drive(spark, tmp_path, first, rpd, n_files=6, compact_every=3)
    n1 = got1.count()
    assert _n_batch_dirs(str(tmp_path / "res")) <= 2
    got2 = (
        _drive(spark, tmp_path, second, rpd, n_files=6, compact_every=3)
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    assert n1 == len(first)
    want = (
        asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                  tolerance="6 hours")
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    assert len(got2) == len(want)
    assert np.allclose(got2["price"].dropna(), want["price"].dropna())
    assert _n_batch_dirs(str(tmp_path / "res")) <= 4


def test_compact_every_validation(spark, tmp_path):
    lpd, rpd = _mk_frames(spark, n_left=4)
    with pytest.raises(ValueError, match="compact_every"):
        _drive(spark, tmp_path, lpd, rpd, n_files=1, compact_every=1)


def _write_batch_dir(spark, res, bid, pdf):
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{res}/batch_id={bid}"
    )


def test_crash_recovery_staged_with_success(spark, tmp_path):
    """Crash AFTER the staging manifest, BEFORE source deletion: the
    next run must promote the staged union and delete the sources —
    same rows, one directory, no duplicates."""
    res = str(tmp_path / "res")
    p0 = pd.DataFrame({"series_id": ["a"], "v": [1.0]})
    p1 = pd.DataFrame({"series_id": ["b"], "v": [2.0]})
    _write_batch_dir(spark, res, 0, p0)
    _write_batch_dir(spark, res, 1, p1)
    staging = f"{res}/.compact_tmp/w0_1"
    spark.read.parquet(f"{res}/batch_id=0", f"{res}/batch_id=1").coalesce(
        1
    ).write.parquet(staging)
    assert os.path.exists(f"{staging}/_SUCCESS")
    _finish_pending_compactions(spark, res)
    assert _list_batch_ids(spark, res) == [1]
    rows = spark.read.parquet(res).orderBy("v").collect()
    assert [r["v"] for r in rows] == [1.0, 2.0]  # nothing lost, no dups


def test_crash_recovery_staged_without_success(spark, tmp_path):
    """Crash DURING the staging write (no manifest): staging is
    discarded, sources stay intact, and a later compaction pass
    collapses them normally."""
    res = str(tmp_path / "res")
    p0 = pd.DataFrame({"series_id": ["a"], "v": [1.0]})
    p1 = pd.DataFrame({"series_id": ["b"], "v": [2.0]})
    _write_batch_dir(spark, res, 0, p0)
    _write_batch_dir(spark, res, 1, p1)
    staging = f"{res}/.compact_tmp/w0_1"
    # a partial, manifest-less staging write
    spark.createDataFrame(p0).coalesce(1).write.parquet(staging)
    os.remove(f"{staging}/_SUCCESS")
    _finish_pending_compactions(spark, res)
    assert not os.path.exists(staging)
    assert _list_batch_ids(spark, res) == [0, 1]  # sources untouched
    _auto_compact_sink(spark, res, float("inf"), 2)
    assert _list_batch_ids(spark, res) == [1]
    assert spark.read.parquet(res).count() == 2


def test_asof_stream_crash_between_output_and_commit(spark, tmp_path):
    """The crash-window resume test the other sinks have (r11 verdict
    item 7): batch output landed but commits/<n> did not — the resumed
    drain must re-run that batch, OVERWRITE its own batch_id dir, and
    end with zero duplicate rows."""
    lpd, rpd = _mk_frames(spark, n_left=20)
    first = lpd.iloc[:10]
    second = lpd.iloc[10:]
    got1 = _drive(spark, tmp_path, first, rpd, n_files=1,
                  compact_every=None)
    assert got1.count() == len(first)
    ckpt = str(tmp_path / "ckpt")
    commits = os.path.join(ckpt, "commits")
    removed = [f for f in os.listdir(commits) if not f.startswith(".")]
    assert removed, "drain committed nothing?"
    for f in removed:
        os.remove(os.path.join(commits, f))
        crc = os.path.join(commits, f".{f}.crc")
        if os.path.exists(crc):
            os.remove(crc)
    got = (
        _drive(spark, tmp_path, second, rpd, n_files=1, compact_every=None)
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    want = (
        asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                  tolerance="6 hours")
        .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
    )
    assert len(got) == len(want)  # replayed batch overwrote itself
    assert np.allclose(got["price"].dropna(), want["price"].dropna())


def test_fifty_batch_drain_bound(spark, tmp_path):
    """The r11 verdict's literal done-criterion: a 50-micro-batch
    stream with compact_every=10 ends at ceil(50/10)=5 result
    directories with row-count parity."""
    lpd, rpd = _mk_frames(spark, n_keys=1, n_left=100, n_right=8)
    got = _drive(spark, tmp_path, lpd, rpd, n_files=50, compact_every=10)
    assert got.count() == len(lpd)
    assert _n_batch_dirs(str(tmp_path / "res")) <= 5
