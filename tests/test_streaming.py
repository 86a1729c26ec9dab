"""Streaming-vs-batch parity: the streaming plans must produce the same
aggregates as their batch twins when drained with availableNow."""

import tempfile

import pytest
from pyspark.sql import functions as F

from scalecast_spark.sources import load_table, events_to_series
from scalecast_spark.streaming import (
    run_available_now,
    sessionize_stream,
    stream_events,
    windowed_series,
)


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_windowed_series_matches_batch(spark, sf_dir, events_path):
    stream = stream_events(spark, events_path)
    agg = windowed_series(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        got = run_available_now(agg, "ws_test", ckpt).toPandas()
    batch = events_to_series(load_table(spark, sf_dir, "events")).toPandas()
    g = got.set_index(["series_id", "ds"])["y"].sort_index()
    b = batch.set_index(["series_id", "ds"])["y"].sort_index()
    assert len(g) == len(b)
    assert (abs(g - b) < 1e-6).all()


def test_sessionize_stream_counts(spark, sf_dir, events_path):
    from scalecast_spark.operators.sessions import session_stats

    stream = stream_events(spark, events_path)
    sess = sessionize_stream(stream, gap="30 minutes")
    with tempfile.TemporaryDirectory() as ckpt:
        got = run_available_now(sess, "ss_test", ckpt).toPandas()
    batch = session_stats(
        load_table(spark, sf_dir, "events"), gap_seconds=1800
    ).toPandas()
    # same total events and same number of sessions per user
    assert got["n_events"].sum() == batch["n_events"].sum()
    gcnt = got.groupby("user_id").size().sort_index()
    bcnt = batch.groupby("user_id").size().sort_index()
    assert (gcnt == bcnt).all()


def test_dedup_stream_matches_batch_count(spark, sf_dir):
    """Streaming exact dedup (first-seen per content hash) must keep
    exactly as many docs as the batch dedup_exact twin."""
    from scalecast_spark.datapipe.dedup import dedup_exact
    from scalecast_spark.streaming import dedup_stream, run_available_now, stream_documents

    docs_path = f"{sf_dir}/documents.parquet"
    stream = stream_documents(spark, docs_path)
    deduped = dedup_stream(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        got = run_available_now(
            deduped, "dedup_test", ckpt, output_mode="append"
        ).toPandas()
    batch = dedup_exact(load_table(spark, sf_dir, "documents")).toPandas()
    assert len(got) == len(batch)
    # the surviving CONTENT is identical even if chosen ids differ
    import hashlib
    def norm(t):
        import re
        return re.sub(r"\s+", " ", t.strip().lower())
    assert {norm(t) for t in got["text"]} == {norm(t) for t in batch["text"]}


def test_dedup_stream_watermark_plan(spark, sf_dir):
    """The watermarked variant must build a valid streaming plan with
    dropDuplicatesWithinWatermark (bounded state)."""
    from scalecast_spark.streaming import dedup_stream, stream_events

    ev = stream_events(spark, f"{sf_dir}/events.parquet").withColumnRenamed(
        "props", "text"
    )
    out = dedup_stream(ev, text_col="text", ts_col="ts", watermark="1 hour")
    assert out.isStreaming


def test_curate_stream_matches_batch(spark, sf_dir):
    """curate_corpus (no benchmark) is stateless column math -> the
    same operator curates a readStream firehose in append mode."""
    import tempfile

    from scalecast_spark.datapipe.text import curate_corpus
    from scalecast_spark.sources import load_table
    from scalecast_spark.streaming import run_available_now, stream_documents

    batch = curate_corpus(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "keep", "drop_reasons", "n_emails"
    )
    stream = curate_corpus(
        stream_documents(spark, f"{sf_dir}/documents.parquet")
    ).select("doc_id", "keep", "drop_reasons", "n_emails")
    assert stream.isStreaming
    with tempfile.TemporaryDirectory() as ckpt:
        got = run_available_now(
            stream, "q_curate_stream", ckpt, output_mode="append"
        )
        got_pdf = got.toPandas().sort_values("doc_id").reset_index(drop=True)
    want = batch.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got_pdf) == len(want) > 0
    assert (got_pdf["keep"] == want["keep"]).all()
    assert [list(a) for a in got_pdf["drop_reasons"]] == [
        list(a) for a in want["drop_reasons"]
    ]


def test_curate_corpus_rules(spark):
    from scalecast_spark.datapipe.text import curate_corpus

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is a fine day today ok"),
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "hi"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the cat sat on the mat and it is a fine day")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curate_corpus(docs, bench).collect()}
    assert rows[0]["keep"] is False  # contaminated by the bench doc
    assert "benchmark_contaminated" in rows[0]["drop_reasons"]
    assert rows[1]["keep"] is False
    assert "repetitive_2grams" in rows[1]["drop_reasons"]
    assert rows[2]["keep"] is False
    assert "too_few_tokens" in rows[2]["drop_reasons"]


def test_stratified_sample_stream_matches_batch(spark, sf_dir):
    """Deterministic sampling is a stateless scan-side filter — the
    SAME rows survive whether the corpus arrives as a table or a
    stream (md5 of the key, no RNG state), so ingest-time downsampling
    of a crawl firehose is exact."""
    import tempfile

    from scalecast_spark.datapipe.sample import stratified_sample
    from scalecast_spark.sources import load_table
    from scalecast_spark.streaming import run_available_now, stream_documents

    rates = {"src0": 1.0, "src1": 0.5}
    batch = stratified_sample(
        load_table(spark, sf_dir, "documents"),
        rates, "source", "doc_id", default_rate=0.2,
    ).select("doc_id")
    stream = stratified_sample(
        stream_documents(spark, f"{sf_dir}/documents.parquet"),
        rates, "source", "doc_id", default_rate=0.2,
    ).select("doc_id")
    assert stream.isStreaming
    with tempfile.TemporaryDirectory() as ckpt:
        got = {
            r["doc_id"]
            for r in run_available_now(
                stream, "q_sample_stream", ckpt, output_mode="append"
            ).collect()
        }
    want = {r["doc_id"] for r in batch.collect()}
    assert got == want and len(want) > 0


def test_ewma_stream_stateful_parity(spark, sf_dir):
    """applyInPandasWithState EWMA: the cross-batch recursive fold must
    equal the plain pandas recursion over the whole (ordered) series."""
    import tempfile

    from scalecast_spark.sources import load_table, events_to_series
    from scalecast_spark.streaming import run_available_now
    from scalecast_spark.streaming.ops import ewma_stream, stream_events, windowed_series

    from pyspark.sql import functions as F

    alpha = 0.3
    ev = stream_events(spark, f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("series_id"), F.col("ts").alias("ds"),
        F.col("value").alias("y"),
    )
    out = ewma_stream(ev, alpha=alpha)
    assert out.isStreaming
    with tempfile.TemporaryDirectory() as ckpt:
        got = (
            run_available_now(out, "q_ewma_stream", ckpt, output_mode="append")
            .toPandas().sort_values(["series_id", "ds", "y"]).reset_index(drop=True)
        )
    # expected: same daily series from the batch reader, pandas fold
    batch = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("series_id"), F.col("ts").alias("ds"),
            F.col("value").alias("y"),
        )
        .toPandas().sort_values(["series_id", "ds", "y"])
    )
    assert len(got) == len(batch) > 0
    for sid, grp in batch.groupby("series_id"):
        level, want = None, []
        for yv in grp["y"]:
            level = yv if level is None else alpha * yv + (1 - alpha) * level
            want.append(level)
        g = got[got["series_id"] == sid]["ewma"].to_numpy()
        assert len(g) == len(want)
        assert max(abs(g - want)) < 1e-9


def test_decontamination_stream_static_join(spark, sf_dir):
    """Benchmark decontamination on a LIVE stream: the corpus arrives
    as a readStream, the (static) benchmark n-gram hash set joins in
    as a broadcast stream-static join, and the per-doc hit counts
    aggregate in complete mode — the downstream batch-step posture the
    curate_corpus docstring describes, exercised end-to-end."""
    import tempfile

    from pyspark.sql import functions as F

    from scalecast_spark.datapipe.text import contamination_hits
    from scalecast_spark.sources import load_table
    from scalecast_spark.streaming import run_available_now, stream_documents

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    want = (
        contamination_hits(docs, bench, n=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    stream = contamination_hits(
        stream_documents(spark, f"{sf_dir}/documents.parquet"), bench, n=8
    )
    assert stream.isStreaming
    with tempfile.TemporaryDirectory() as ckpt:
        got = (
            run_available_now(
                stream, "q_contam_stream", ckpt, output_mode="complete"
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert len(got) == len(want) > 0
    assert (got["doc_id"].values == want["doc_id"].values).all()
    assert (got["n_contam"].values == want["n_contam"].values).all()


def test_split_and_chunk_stream_parity(spark, sf_dir):
    """hash_split and chunk_documents are stateless projections, so
    they apply to a readStream firehose unchanged (append mode) and
    reproduce the batch rows exactly."""
    import tempfile

    from scalecast_spark.datapipe.sample import hash_split
    from scalecast_spark.datapipe.text import chunk_documents
    from scalecast_spark.sources import load_table
    from scalecast_spark.streaming import run_available_now, stream_documents

    docs = load_table(spark, sf_dir, "documents")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    b1 = hash_split(docs, fr, "doc_id").select("doc_id", "split")
    b2 = chunk_documents(
        docs.select("doc_id", "text"), max_tokens=40, overlap=8
    ).select("doc_id", "chunk_idx", "chunk_text")
    stream = stream_documents(spark, f"{sf_dir}/documents.parquet")
    s1 = hash_split(stream, fr, "doc_id").select("doc_id", "split")
    s2 = chunk_documents(
        stream.select("doc_id", "text"), max_tokens=40, overlap=8
    ).select("doc_id", "chunk_idx", "chunk_text")
    assert s1.isStreaming and s2.isStreaming
    with tempfile.TemporaryDirectory() as ck1, tempfile.TemporaryDirectory() as ck2:
        g1 = run_available_now(s1, "q_split_stream", ck1, output_mode="append")
        g2 = run_available_now(s2, "q_chunk_stream", ck2, output_mode="append")
        for got, want, keys in (
            (g1, b1, ["doc_id"]),
            (g2, b2, ["doc_id", "chunk_idx"]),
        ):
            gp = got.toPandas().sort_values(keys).reset_index(drop=True)
            wp = want.toPandas().sort_values(keys).reset_index(drop=True)
            assert len(gp) == len(wp) > 0
            for c in wp.columns:
                assert (gp[c].values == wp[c].values).all(), c


def test_anomaly_stream_parity_and_spike(spark, sf_dir, tmp_path):
    """Streaming anomaly detector: (1) the cross-batch EW mean/var
    recursion equals the plain pandas recursion over the ordered
    series — including z and flags; (2) an injected spike is flagged
    while the clean prefix is not; (3) scoring uses the PRE-update
    state (the spike itself does not suppress its own flag)."""
    import tempfile

    import numpy as np
    import pandas as pd

    from scalecast_spark.streaming import anomaly_stream, run_available_now

    alpha, zt, min_obs = 0.1, 3.5, 5
    rng = np.random.RandomState(0)
    rows = []
    for sid in ["a", "b"]:
        y = 50 + rng.randn(60)
        y[40] += 30.0  # unmistakable spike
        for i, v in enumerate(y):
            rows.append(
                {
                    "series_id": sid,
                    "ds": pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i),
                    "y": float(v),
                }
            )
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "anom_src")
    # two time-ordered file batches (oldest first): the detector folds
    # batches in ARRIVAL order (the documented ordering contract), so
    # the multi-batch state-carry test must deliver time-ordered files
    import time as _time

    cut = pd.Timestamp("2024-01-01") + pd.Timedelta(hours=30)
    spark.createDataFrame(pdf[pdf["ds"] < cut]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    spark.createDataFrame(pdf[pdf["ds"] >= cut]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("series_id string, ds timestamp, y double")
        .option("maxFilesPerTrigger", 1)  # force multi-batch state carry
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = anomaly_stream(stream, alpha=alpha, z_thresh=zt, min_obs=min_obs)
    assert out.isStreaming
    with tempfile.TemporaryDirectory() as ckpt:
        got = (
            run_available_now(out, "q_anom_stream", ckpt, output_mode="append")
            .toPandas().sort_values(["series_id", "ds"]).reset_index(drop=True)
        )
    assert len(got) == len(pdf)
    for sid, grp in pdf.groupby("series_id"):
        grp = grp.sort_values("ds")
        level, var, n = None, 0.0, 0
        want_flags, want_levels = [], []
        for yv in grp["y"]:
            if level is None:
                level, var, flag = yv, 0.0, False
            else:
                w = (1 - alpha) * (1 - (1 - alpha) ** (n - 1)) if n > 1 else 0.0
                z = (yv - level) / (var / w) ** 0.5 if var > 0 and w > 0 else None
                flag = bool(n >= min_obs and z is not None and abs(z) > zt)
                d = yv - level
                level += alpha * d
                var = (1 - alpha) * (var + alpha * d * d)
            n += 1
            want_flags.append(flag)
            want_levels.append(level)
        g = got[got["series_id"] == sid].sort_values("ds")
        assert np.allclose(g["level"].to_numpy(), want_levels, atol=1e-9)
        assert list(g["is_anomaly"]) == want_flags
        flags = g["is_anomaly"].to_numpy()
        assert flags[40]  # the spike is caught...
        assert not flags[:40].any()  # ...and the clean prefix is quiet


def test_stream_state_ttl_evicts_dormant_series(spark, tmp_path):
    """state_ttl_ms bounds GroupState under series CHURN on a
    CONTINUOUS query: a series active within the TTL keeps its
    cross-batch continuation; after idling past the TTL the
    processing-time timer fires, state is evicted, and the series
    RE-INITIALIZES from its next value (ewma == raw, not the
    NoTimeout continuation)."""
    import time
    from datetime import datetime

    from scalecast_spark.streaming.ops import ewma_stream

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    schema = "series_id string, ds timestamp, y double"
    alpha = 0.5

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def wait_rows(n, deadline=120):
        t0 = time.time()
        while time.time() - t0 < deadline:
            try:
                df = spark.read.parquet(outdir).toPandas()
                if len(df) >= n:
                    return df
            except Exception:
                pass
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows")

    def ewma_at(df, sid, day):
        sel = df[(df["series_id"] == sid)
                 & (df["ds"] == datetime(2024, 1, day))]
        assert len(sel) == 1
        return float(sel["ewma"].iloc[0])

    write([("A", datetime(2024, 1, 1), 10.0),
           ("B", datetime(2024, 1, 1), 100.0)])
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        ewma_stream(stream, alpha=alpha, state_ttl_ms=15000)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        d1 = wait_rows(2)
        assert ewma_at(d1, "A", 1) == 10.0
        assert ewma_at(d1, "B", 1) == 100.0
        # within the TTL: the recursion CONTINUES across batches
        write([("A", datetime(2024, 1, 2), 20.0)])
        d2 = wait_rows(3)
        assert abs(ewma_at(d2, "A", 2)
                   - (alpha * 20.0 + (1 - alpha) * 10.0)) < 1e-9
        time.sleep(25.0)  # idle past the TTL: timers fire, state evicts
        write([("A", datetime(2024, 1, 3), 40.0),
               ("B", datetime(2024, 1, 3), 200.0)])
        d3 = wait_rows(5)
        # restart semantics: ewma == raw value, NOT the NoTimeout
        # continuations (0.5*200+0.5*100=150 / 0.5*40+0.5*15=27.5)
        assert ewma_at(d3, "B", 3) == 200.0
        assert ewma_at(d3, "A", 3) == 40.0
    finally:
        q.stop()


def test_run_available_now_rejects_processing_time_ttl(spark, tmp_path):
    """ADVICE r10: state_ttl_ms + Trigger.AvailableNow hangs forever
    (the drain waits for future processing-time timers). The guard in
    run_available_now must detect the combination from the plan and
    raise BEFORE starting the query, not rely on docstrings."""
    from datetime import datetime

    from scalecast_spark.streaming.ops import ewma_stream, run_available_now

    src = str(tmp_path / "src")
    schema = "series_id string, ds timestamp, y double"
    spark.createDataFrame(
        [("A", datetime(2024, 1, 1), 1.0)], schema
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    ttl = ewma_stream(stream, state_ttl_ms=60000)
    with pytest.raises(ValueError, match="ProcessingTimeTimeout"):
        run_available_now(
            ttl, "ttl_guard_q", str(tmp_path / "ckpt"), output_mode="append"
        )
    # and the same plan WITHOUT the TTL drains fine through the guard
    ok = run_available_now(
        ewma_stream(stream), "ttl_guard_ok", str(tmp_path / "ckpt2"),
        output_mode="append",
    )
    assert ok.count() == 1


def _has_protobuf():
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf package "
    "(absent in this container — SCALE.md round-11 adjudication)",
)
def test_ewma_stream_tws_parity_and_ttl_drain(spark, sf_dir, tmp_path):
    """Env-gated lane for the transformWithStateInPandas twin: (a)
    parity with the GroupState ewma_stream on the same source, and (b)
    the property that motivates it — a TTL'd query still TERMINATES
    under Trigger.AvailableNow (ValueState TTL needs no processing-time
    timers), the combination run_available_now must refuse for the
    GroupState path."""
    from scalecast_spark.streaming.ops import (
        ewma_stream,
        ewma_stream_tws,
        run_available_now,
        stream_events,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = stream_events(spark, f"{sf_dir}/events.parquet").select(
            F.col("event_type").alias("series_id"), F.col("ts").alias("ds"),
            F.col("value").alias("y"),
        )
        got = run_available_now(
            ewma_stream_tws(ev, alpha=0.3, state_ttl_ms=3_600_000),
            "q_tws", str(tmp_path / "ck1"), output_mode="append",
        ).toPandas().sort_values(["series_id", "ds", "y"]).reset_index(drop=True)
        want = run_available_now(
            ewma_stream(ev, alpha=0.3),
            "q_gs", str(tmp_path / "ck2"), output_mode="append",
        ).toPandas().sort_values(["series_id", "ds", "y"]).reset_index(drop=True)
        assert len(got) == len(want) > 0
        assert (got["ewma"] - want["ewma"]).abs().max() < 1e-9
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_ewma_stream_tws_raises_without_protobuf(spark, tmp_path):
    """The gate itself: without protobuf the operator must fail with a
    clear ImportError at CONSTRUCTION, not a crashed driver worker at
    query start."""
    if _has_protobuf():
        pytest.skip("protobuf installed; gate inactive")
    from datetime import datetime

    from scalecast_spark.streaming.ops import ewma_stream_tws

    src = str(tmp_path / "src")
    schema = "series_id string, ds timestamp, y double"
    spark.createDataFrame(
        [("A", datetime(2024, 1, 1), 1.0)], schema
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ImportError, match="protobuf"):
        ewma_stream_tws(stream)


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf package "
    "(absent in this container — SCALE.md round-11 adjudication)",
)
def test_anomaly_stream_tws_parity(spark, sf_dir, tmp_path):
    """Env-gated: the TWS anomaly twin must match the GroupState
    anomaly_stream row-for-row on the same drained source."""
    from scalecast_spark.streaming.ops import (
        anomaly_stream,
        anomaly_stream_tws,
        run_available_now,
        stream_events,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = stream_events(spark, f"{sf_dir}/events.parquet").select(
            F.col("event_type").alias("series_id"), F.col("ts").alias("ds"),
            F.col("value").alias("y"),
        )
        got = run_available_now(
            anomaly_stream_tws(ev, state_ttl_ms=3_600_000),
            "q_anom_tws", str(tmp_path / "ck1"), output_mode="append",
        ).toPandas().sort_values(["series_id", "ds", "y"]).reset_index(drop=True)
        want = run_available_now(
            anomaly_stream(ev),
            "q_anom_gs", str(tmp_path / "ck2"), output_mode="append",
        ).toPandas().sort_values(["series_id", "ds", "y"]).reset_index(drop=True)
        assert len(got) == len(want) > 0
        assert (got["level"] - want["level"]).abs().max() < 1e-9
        assert (got["is_anomaly"] == want["is_anomaly"]).all()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_anomaly_stream_tws_raises_without_protobuf(spark, tmp_path):
    if _has_protobuf():
        pytest.skip("protobuf installed; gate inactive")
    from datetime import datetime

    from scalecast_spark.streaming.ops import anomaly_stream_tws

    src = str(tmp_path / "src")
    schema = "series_id string, ds timestamp, y double"
    spark.createDataFrame(
        [("A", datetime(2024, 1, 1), 1.0)], schema
    ).write.parquet(src)
    with pytest.raises(ImportError, match="protobuf"):
        anomaly_stream_tws(spark.readStream.schema(schema).parquet(src))


def test_event_ttl_composes_with_available_now(spark, tmp_path):
    """ttl_clock='event' (round 11): eviction timers are driven by the
    WATERMARK, not wall clock — so a TTL'd drain terminates under
    Trigger.AvailableNow (the processing-time clock hangs there; the
    run_available_now guard refuses it), and eviction is deterministic
    in event time: a series whose last event falls TTL behind the
    watermark is dropped, and its next appearance RESTARTS the
    recursion. No sleeps, no timing dependence."""
    import time as _time
    from datetime import datetime

    from scalecast_spark.streaming.ops import ewma_stream, run_available_now

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    schema = "series_id string, ds timestamp, y double"
    alpha = 0.5

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    # batch 1: both series born       batch 2: both continue (in TTL)
    # batch 3: B jumps 18 days ahead  batch 4: B again -> watermark is
    #   now far past A's (last event + TTL): A's timer fires, evicted
    # batch 5: A reappears -> fresh recursion (ewma == raw value)
    write([("A", datetime(2024, 1, 1), 10.0),
           ("B", datetime(2024, 1, 1), 100.0)])
    write([("A", datetime(2024, 1, 2), 20.0),
           ("B", datetime(2024, 1, 2), 200.0)])
    write([("B", datetime(2024, 1, 20), 300.0)])
    write([("B", datetime(2024, 1, 21), 400.0)])
    write([("A", datetime(2024, 1, 22), 40.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = ewma_stream(
        stream,
        alpha=alpha,
        state_ttl_ms=5 * 86_400_000,  # 5 days, event time
        ttl_clock="event",
        watermark="1 day",
    )
    got = (
        run_available_now(out, "q_event_ttl", ckpt, output_mode="append")
        .toPandas()
    )

    def ewma_at(sid, day):
        sel = got[(got["series_id"] == sid)
                  & (got["ds"] == datetime(2024, 1, day))]
        assert len(sel) == 1, (sid, day, got)
        return float(sel["ewma"].iloc[0])

    # in-TTL continuation is the normal recursion
    assert ewma_at("A", 2) == alpha * 20.0 + (1 - alpha) * 10.0
    assert ewma_at("B", 2) == alpha * 200.0 + (1 - alpha) * 100.0
    # B stayed live the whole time: its recursion never resets
    assert ewma_at("B", 21) != 400.0
    # A idled 20 event-days with a 5-day TTL: evicted, restart
    assert ewma_at("A", 22) == 40.0


def test_event_ttl_validation(spark, tmp_path):
    """Build-time failures, not runtime hangs: a bad ttl_clock and an
    event clock with no watermark must both raise immediately."""
    from datetime import datetime

    from scalecast_spark.streaming.ops import ewma_stream

    src = str(tmp_path / "src")
    schema = "series_id string, ds timestamp, y double"
    spark.createDataFrame(
        [("A", datetime(2024, 1, 1), 1.0)], schema
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="ttl_clock"):
        ewma_stream(stream, state_ttl_ms=1000, ttl_clock="wall")
    with pytest.raises(ValueError, match="watermark"):
        ewma_stream(stream, state_ttl_ms=1000, ttl_clock="event")
    # an upstream withWatermark satisfies the check without the kwarg
    ewma_stream(
        stream.withWatermark("ds", "1 hour"),
        state_ttl_ms=1000,
        ttl_clock="event",
    )


def test_anomaly_event_ttl_parity_with_no_ttl(spark, tmp_path):
    """With a TTL far above every gap, the event-clock path must be a
    pure no-op on the numbers: identical output to the NoTimeout run
    across a multi-batch drain (certifies the fold math is untouched
    by the timer plumbing — and that the TTL'd plan passes the
    AvailableNow guard)."""
    import time as _time

    import numpy as np
    import pandas as pd

    from scalecast_spark.streaming.ops import anomaly_stream, run_available_now

    rng = np.random.RandomState(7)
    rows = []
    for sid in ["a", "b"]:
        for i, v in enumerate(50 + rng.randn(24)):
            rows.append({
                "series_id": sid,
                "ds": pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i),
                "y": float(v),
            })
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "src")
    cut = pd.Timestamp("2024-01-01") + pd.Timedelta(hours=12)
    spark.createDataFrame(pdf[pdf["ds"] < cut]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(pdf[pdf["ds"] >= cut]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain(name, **ttl_kwargs):
        stream = (
            spark.readStream.schema("series_id string, ds timestamp, y double")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        return (
            run_available_now(
                anomaly_stream(stream, **ttl_kwargs),
                name,
                str(tmp_path / f"ckpt_{name}"),
                output_mode="append",
            )
            .toPandas()
            .sort_values(["series_id", "ds"])
            .reset_index(drop=True)
        )

    plain = drain("q_anom_plain")
    ttld = drain(
        "q_anom_ettl",
        state_ttl_ms=365 * 86_400_000,
        ttl_clock="event",
        watermark="0 seconds",
    )
    assert len(plain) == len(ttld) == len(pdf)
    assert np.allclose(plain["level"], ttld["level"], atol=0)
    assert list(plain["is_anomaly"]) == list(ttld["is_anomaly"])
