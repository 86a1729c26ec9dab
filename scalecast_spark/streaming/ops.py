"""Structured Streaming twins of the batch operators.

The reference has no streaming surface (its "time series" are batch
arrays — SURVEY.md §2.12); this module is the engine's scale-out
extension: the same resample/sessionize semantics as the batch ops,
expressed as streaming plans so a 100 TB/day event firehose feeds the
same long-format series frame incrementally.

Design:
  * event-time windows + watermarks bound state (late data beyond the
    watermark is dropped deterministically);
  * ``session_window`` matches operators/sessions.py gap semantics;
  * ``run_available_now`` drains whatever is in the source with
    Trigger.AvailableNow — the batch-parity test harness AND the
    nightly-catchup pattern on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from scalecast_spark.frame import DS, SERIES, Y

#: fallback when the source can't be probed (e.g. dir not yet created)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the events parquet source. The file source wants
    a DIRECTORY; a single-file path (the testdata layout) is handled by
    streaming its parent with a glob filter. maxFilesPerTrigger
    throttles micro-batch size on a real backlog.

    The streaming source requires an explicit schema; it is derived from
    the batch footer so the ``ts`` physical type matches whatever the
    generator wrote — TIMESTAMP(MICROS) reads as timestamp directly,
    TIMESTAMP(NANOS) only as long (legacy nanosAsLong) and is converted
    to a microsecond timestamp below."""
    import os

    # the nanosAsLong conf is needed (a) for the probe and (b) at
    # EXECUTION time iff the source really is TIMESTAMP(NANOS). The
    # probe runs under try/finally so the caller's previous value is
    # always restored; ONLY a confirmed nanos source re-sets it (and
    # leaves it set — the running stream decodes through it, which is
    # a lasting, documented session-conf change in that case).
    _CONF = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(_CONF)
    except Exception:
        prev = None
    spark.conf.set(_CONF, "true")
    try:
        try:
            schema = spark.read.parquet(path).schema
            # watermarks require TIMESTAMP (ltz); batch inference may
            # yield TIMESTAMP_NTZ for micros parquet without tz metadata
            schema = T.StructType(
                [
                    T.StructField(f.name, T.TimestampType(), f.nullable)
                    if isinstance(f.dataType, T.TimestampNTZType)
                    else f
                    for f in schema.fields
                ]
            )
        except Exception:
            schema = EVENTS_SCHEMA
    finally:
        # ALWAYS put the caller's session back first — a probe failure
        # must not leave the conf flipped for unrelated batch reads
        if prev is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, prev)
    is_nanos = any(
        f.name == "ts" and isinstance(f.dataType, T.LongType)
        for f in schema.fields
    )
    if is_nanos:
        # TIMESTAMP(NANOS) source: stream EXECUTION needs the conf for
        # the lifetime of the query, so this set is deliberately
        # lasting (documented above) — nanos decode elsewhere in the
        # session will also read as long while the stream runs
        spark.conf.set(_CONF, "true")
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 4)
    if path.endswith(".parquet") and os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if dict(raw.dtypes).get("ts") == "bigint":  # nanos-as-long source
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def windowed_series(
    events: DataFrame,
    bucket: str = "1 day",
    watermark: str = "2 days",
    series_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of sources.events_to_series: tumbling event-time
    windows with a watermark; emits (series_id, ds, y). State per
    (series, window) is one partial sum — O(active windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col(series_col).cast("string").alias(SERIES),
            F.window("ts", bucket).alias("_w"),
        )
        .agg(F.sum(value_col).cast("double").alias(Y))
        .select(SERIES, F.col("_w.start").alias(DS), Y)
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 days",
    entity_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` — the native
    stateful operator (same gap semantics as operators/sessions.py).
    Emits one row per closed session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col(entity_col), F.session_window("ts", gap).alias("_s"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            entity_col,
            F.col("_s.start").alias("session_start"),
            F.col("_s.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the documents parquet source (single-file paths
    handled like stream_events)."""
    import os

    reader = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 4)
    if path.endswith(".parquet") and os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming twin of datapipe.dedup.dedup_exact: first-SEEN doc per
    normalized content hash survives (the batch twin keeps the lowest
    id — arrival order and id order coincide for ordered backfills).

    With an event-time column the dedup state is BOUNDED:
    ``dropDuplicatesWithinWatermark`` evicts hashes older than the
    watermark — the right semantics for a continuous crawl firehose
    where re-crawls arrive close together. Without one, state grows
    with distinct content (use only for bounded AvailableNow drains).
    """
    from scalecast_spark.datapipe.dedup import normalize_text

    out = docs.withColumn("_h", F.md5(normalize_text(F.col(text_col))))
    if ts_col:
        out = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["_h"]
        )
    else:
        out = out.dropDuplicates(["_h"])
    return out.drop("_h")


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    """Path existence through the Hadoop FS API — os.path only sees
    the local filesystem, so an s3a://, hdfs://, etc. sink path would
    always read as absent (a reuse guard that never fires and a
    zero-batch check that discards real results)."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def _qualified(spark: SparkSession, path: str) -> str:
    """Canonical form of a path for identity comparison: scheme- and
    authority-qualified against its own filesystem, trailing slashes
    normalized by the Path constructor — so '/a/b', '/a/b/' and
    'file:///a/b' all compare equal. Raw string comparison would
    spuriously refuse a legitimate resume that spells the same
    directory differently (ADVICE r10)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return str(p.getFileSystem(conf).makeQualified(p))


def _has_commits(spark: SparkSession, checkpoint_dir: str) -> bool:
    """True iff the checkpoint records at least one COMMITTED
    micro-batch. Spark's file-sink WAL order is offsets/<n> BEFORE the
    batch executes and commits/<n> AFTER it finishes — so offsets alone
    mean an in-flight batch, not finished output. Gating 'committed
    progress' on offsets/ (the pre-r11 behavior) mislabeled a crash
    after offsets/0-but-before-output as resumable-with-missing-rows."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_dir}/commits")
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        if not st.getPath().getName().startswith("."):
            return True
    return False


def _check_sink_paths(
    op: str, spark: SparkSession, results_path: str, checkpoint_dir: str
) -> None:
    """Sink path contract shared by the foreachBatch serve/dedup
    streams. Results and checkpoint must travel TOGETHER; combined
    with the per-batch idempotent sink (each micro-batch OVERWRITES
    its own ``batch_id=<n>`` directory under results_path), every
    crash window resumes exactly-once:

      * crash after offsets/<n>, before any output -> batch n re-runs
        and writes its directory once;
      * crash after (partial or full) batch output, before
        commits/<n>  -> batch n re-runs and overwrites its OWN
        directory — no duplicate rows (this window was at-least-once
        before r11, when batches appended to a shared directory);
      * crash after commits/<n> -> batch n skips; its directory is
        already complete.

    The states this guard refuses (all fail-fast, never silent):

      * results exist but the checkpoint has no marker -> a fresh run
        would mix a previous run's rows into this answer;
      * committed progress but results_path is gone -> committed
        batches would skip with their output missing;
      * the checkpoint's marker names a DIFFERENT results_path ->
        a mismatched pair would skip committed batches AND write next
        to foreign rows. Paths are compared in qualified form (scheme +
        authority, trailing slash stripped), so spelling the same
        directory differently is not a mismatch.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(
        f"{checkpoint_dir}/__scalecast_results_path__"
    )
    fs = marker.getFileSystem(conf)
    res = _hadoop_exists(spark, results_path)
    committed = _has_commits(spark, checkpoint_dir)
    res_q = _qualified(spark, results_path)
    if committed and not res:
        raise FileNotFoundError(
            f"{op}: checkpoint_dir {checkpoint_dir!r} records committed "
            f"micro-batches but results_path {results_path!r} does not "
            f"exist — resuming would skip those batches with their "
            f"output gone. Use fresh paths for both, or restore the "
            f"original results_path."
        )
    if fs.exists(marker):
        stream = fs.open(marker)
        try:
            recorded = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            ).strip()
        finally:
            stream.close()
        if _qualified(spark, recorded) != res_q:
            raise FileExistsError(
                f"{op}: checkpoint_dir {checkpoint_dir!r} was created "
                f"for results_path {recorded!r}, not "
                f"{results_path!r} — resuming against a different "
                f"results directory would skip committed batches AND "
                f"write next to foreign rows. Reunite the original pair "
                f"or start fresh with both paths new."
            )
        return  # same pair -> resume (idempotent batch dirs make every
        # offsets/commits/results combination safe)
    if res:
        raise FileExistsError(
            f"{op}: results_path {results_path!r} already exists but "
            f"checkpoint_dir {checkpoint_dir!r} holds no marker for it "
            f"— a fresh run would mix a previous run's rows into this "
            f"answer. Use fresh paths for both (version by run id), or "
            f"pass the ORIGINAL checkpoint_dir to resume."
        )
    if committed:
        raise FileExistsError(
            f"{op}: checkpoint_dir {checkpoint_dir!r} has committed "
            f"progress but no results marker — it was not created by "
            f"this module's sinks; refusing to adopt it. Use a fresh "
            f"checkpoint_dir."
        )
    out = fs.create(marker, True)
    try:
        out.write(bytearray(res_q.encode("utf-8")))
    finally:
        out.close()


def _results_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _list_batch_ids(spark: SparkSession, results_path: str) -> list[int]:
    """batch ids present as ``batch_id=<n>`` directories (one FS
    listing — cheap at any scale; the directory count, not the data,
    is what auto-compaction bounds)."""
    fs, jvm = _results_fs(spark, results_path)
    root = jvm.org.apache.hadoop.fs.Path(results_path)
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(ids)


#: staging area for in-stream compaction — dot-prefixed so Spark's
#: file index never reads it as data
_COMPACT_TMP = ".compact_tmp"


def _check_compact_every(compact_every: int | None) -> None:
    if compact_every is not None and compact_every < 2:
        raise ValueError(
            f"compact_every must be >= 2 (a window of 1 is a no-op); "
            f"got {compact_every}"
        )


def _finish_pending_compactions(spark: SparkSession, results_path: str) -> None:
    """Complete (or discard) compactions interrupted by a crash.

    A staging dir ``.compact_tmp/w<lo>_<hi>`` WITH ``_SUCCESS`` holds
    the full union of batch dirs lo..hi and must be promoted: delete
    any surviving source dirs in [lo, hi], rename staging to
    ``batch_id=<hi>``. One WITHOUT ``_SUCCESS`` is an incomplete write
    whose sources are still intact (sources are only deleted after
    ``_SUCCESS``) — discard it. Both arms are idempotent, so a crash
    inside THIS function is recovered by the next call."""
    fs, jvm = _results_fs(spark, results_path)
    Path = jvm.org.apache.hadoop.fs.Path
    tmp_root = Path(f"{results_path}/{_COMPACT_TMP}")
    if not fs.exists(tmp_root):
        return
    for st in fs.listStatus(tmp_root):
        name = st.getPath().getName()
        if not name.startswith("w"):
            continue
        try:
            lo, hi = (int(x) for x in name[1:].split("_", 1))
        except ValueError:
            continue
        staging = f"{results_path}/{_COMPACT_TMP}/{name}"
        if not fs.exists(Path(f"{staging}/_SUCCESS")):
            fs.delete(Path(staging), True)  # incomplete; sources intact
            continue
        for i in range(lo, hi + 1):
            fs.delete(Path(f"{results_path}/batch_id={i}"), True)
        fs.rename(Path(staging), Path(f"{results_path}/batch_id={hi}"))


def _auto_compact_sink(
    spark: SparkSession,
    results_path: str,
    current_batch_id: int | float,
    compact_every: int | None,
) -> None:
    """Collapse every FULL window of ``compact_every`` committed batch
    directories into one — called from inside ``foreachBatch`` before
    the current batch writes, so it only ever touches batches with a
    ``commits/<n>`` WAL entry, which Spark never replays: compaction
    cannot race a batch replay and exactly-once is preserved. (The
    current batch's own window stays untouched until a LATER batch's
    callback sees it completed.)

    Crash-safe by staging: the window's union is written to a
    dot-prefixed staging dir first (``_SUCCESS`` = staging complete),
    sources are deleted only after that, and the staging dir is
    renamed into the window's highest batch id. Every crash point is
    re-entered idempotently by :func:`_finish_pending_compactions`.

    A long-lived stream therefore holds ≤ ceil(n/compact_every) + 1
    result directories instead of one per trigger — the directory
    fragmentation bound :func:`compact_results` provides for archived
    streams, maintained ONLINE without breaking resumability (the
    results_path + checkpoint pair stays the resumable object).

    ``current_batch_id=float('inf')`` is the end-of-drain form: after
    ``awaitTermination`` succeeds every batch has a durable
    ``commits/<n>`` entry (none can ever replay), so the trailing
    window compacts too and the drain ends at exactly
    ceil(n/compact_every) directories."""
    if compact_every is None:
        return
    _finish_pending_compactions(spark, results_path)
    ids = _list_batch_ids(spark, results_path)
    committed = [i for i in ids if i < current_batch_id]
    windows: dict[int, list[int]] = {}
    for i in committed:
        windows.setdefault(i // compact_every, []).append(i)
    fs, jvm = _results_fs(spark, results_path)
    Path = jvm.org.apache.hadoop.fs.Path
    for w, members in sorted(windows.items()):
        # a window compacts only once every batch it could ever hold is
        # committed (its id range is fully below the current batch)
        if (w + 1) * compact_every - 1 >= current_batch_id:
            continue
        if len(members) <= 1:
            continue  # already compacted, or sparse (empty batches)
        lo, hi = min(members), max(members)
        staging = f"{results_path}/{_COMPACT_TMP}/w{lo}_{hi}"
        (
            spark.read.parquet(
                *[f"{results_path}/batch_id={i}" for i in members]
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(staging)
        )
        # the staging-complete marker gates source deletion in crash
        # recovery; create it explicitly in case the committer's own
        # _SUCCESS marker is disabled by conf
        succ = Path(f"{staging}/_SUCCESS")
        if not fs.exists(succ):
            fs.create(succ, True).close()
        for i in members:
            fs.delete(Path(f"{results_path}/batch_id={i}"), True)
        fs.rename(Path(staging), Path(f"{results_path}/batch_id={hi}"))


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
    output_mode: str | None = None,
) -> DataFrame:
    """Drain the source into an in-memory table with Trigger.AvailableNow
    and return the materialized result as a batch DataFrame.
    ``output_mode`` defaults to 'complete' for aggregating streams;
    pass 'append' for row-level operators (dedup_stream).

    Refuses plans carrying PROCESSING-TIME GroupState timeouts
    (``ewma_stream``/``anomaly_stream`` with ``state_ttl_ms`` set): under
    AvailableNow such a query drains the backlog and then stays alive
    waiting for future wall-clock timers instead of terminating — a
    silent hang until the awaitTermination timeout (observed on Spark
    4.x; ADVICE r10 #4). For a bounded drain leave ``state_ttl_ms``
    unset — or use ``ttl_clock='event'`` (round 11), whose
    watermark-driven timers compose with AvailableNow and pass this
    guard."""
    if output_mode is None:
        output_mode = "complete" if stream_df.isStreaming else "append"
    if stream_df.isStreaming and "ProcessingTimeTimeout" in (
        stream_df._jdf.queryExecution().analyzed().toString()
    ):
        raise ValueError(
            f"run_available_now({query_name!r}): the plan contains a "
            f"stateful operator with ProcessingTimeTimeout (a "
            f"state_ttl_ms-bounded ewma_stream/anomaly_stream). "
            f"Trigger.AvailableNow never terminates while processing-"
            f"time timers are registered — the drain would hang until "
            f"the timeout. Leave state_ttl_ms unset for bounded "
            f"drains, or run the TTL'd query under a continuous "
            f"trigger."
        )
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = stream_df.sparkSession
    return spark.table(query_name)


def _prepare_ttl_input(
    series: DataFrame,
    ts_col: str,
    state_ttl_ms: int | None,
    ttl_clock: str,
    watermark: str | None,
) -> DataFrame:
    """Shared TTL-plumbing validation for the GroupState streams.
    Applies ``watermark`` if given; for ``ttl_clock='event'`` verifies
    a watermark is actually present in the plan (event-time timers
    never fire without one — Spark's own error surfaces at runtime
    deep in the query; failing at build time is kinder)."""
    if ttl_clock not in ("processing", "event"):
        raise ValueError(
            f"ttl_clock must be 'processing' or 'event'; got {ttl_clock!r}"
        )
    if watermark is not None and series.isStreaming:
        series = series.withWatermark(ts_col, watermark)
    if ttl_clock == "event" and state_ttl_ms is not None:
        if series.isStreaming and "EventTimeWatermark" not in (
            series._jdf.queryExecution().analyzed().toString()
        ):
            raise ValueError(
                "ttl_clock='event' needs an event-time watermark on the "
                "input (timers fire when the watermark passes them): "
                "pass watermark='<delay>' or call "
                f"withWatermark({ts_col!r}, ...) upstream"
            )
    return series


def _ttl_timeout_conf(state_ttl_ms: int | None, ttl_clock: str):
    from pyspark.sql.streaming.state import GroupStateTimeout

    if state_ttl_ms is None:
        return GroupStateTimeout.NoTimeout
    if ttl_clock == "event":
        return GroupStateTimeout.EventTimeTimeout
    return GroupStateTimeout.ProcessingTimeTimeout


def _arm_ttl(state, state_ttl_ms, ttl_clock, last_event_ms=None) -> None:
    """Re-arm a group's eviction timer after a fold. Processing clock:
    wall-time duration. Event clock: last event time in this batch +
    TTL, clamped to the current watermark (setTimeoutTimestamp refuses
    timestamps behind the watermark — a very late group's timer fires
    on the next batch instead of erroring the query). When a fold saw
    no rows (empty Arrow chunks edge), the watermark itself is the
    base: the group still dies TTL after the stream's event time
    passes it."""
    if state_ttl_ms is None:
        return
    if ttl_clock == "processing":
        state.setTimeoutDuration(state_ttl_ms)
        return
    wm = state.getCurrentWatermarkMs()
    base = wm if last_event_ms is None else last_event_ms
    state.setTimeoutTimestamp(max(base + state_ttl_ms, wm, 1))


def ewma_stream(
    series: DataFrame,
    alpha: float = 0.3,
    series_col: str = SERIES,
    ts_col: str = DS,
    value_col: str = Y,
    state_ttl_ms: int | None = None,
    ttl_clock: str = "processing",
    watermark: str | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the arbitrary-state API — the ops above use Spark's NATIVE
    stateful operators; this is the escape hatch for recursions Spark
    has no operator for): per-series recursive EWMA
    ``level = alpha*y + (1-alpha)*level`` carried ACROSS micro-batches
    in explicit GroupState. State per series is two scalars — O(series)
    total, no growth with stream length.

    ``state_ttl_ms`` (processing-time milliseconds) bounds state under SERIES
    CHURN, the axis O(series) doesn't cover: on an open-world key
    space (one series per user/session/crawl-host) dormant keys would
    accumulate forever under NoTimeout. With a TTL, a series idle for
    that long (processing time) is EVICTED; if it later reappears its
    recursion re-initializes from the next value — the documented
    restart semantics, identical to a brand-new series. Choose a TTL
    well above the longest expected gap between a live series' events.

    ``ttl_clock`` picks the eviction clock (round 11):

      * ``'processing'`` (default) — wall-clock
        ProcessingTimeTimeout. A CONTINUOUS-query feature: under
        Trigger.AvailableNow such a query stays alive waiting for
        future wall-clock timers instead of terminating after the
        drain (observed on Spark 4.x) — :func:`run_available_now`
        detects the combination from the plan and raises up front
        rather than hanging.
      * ``'event'`` — EventTimeTimeout: a series is evicted once the
        STREAM'S WATERMARK passes its last event time + TTL. No
        wall-clock timers, so this COMPOSES with Trigger.AvailableNow
        (bounded drains keep bounded state) and eviction is
        deterministic in the data, not in scheduling. Requires a
        watermark on the input — pass ``watermark='<delay>'`` here or
        ``withWatermark`` upstream.

    Ordering caveat (inherent to the API, documented not hidden): rows
    are folded in event-time order WITHIN each micro-batch, and batches
    in arrival order; for a source that can deliver late rows ACROSS
    batch boundaries, pair with an upstream watermark+window stage.
    Batch-parity vs the pandas recursion is asserted in tests.
    Feed a RAW stream (map-only lineage): Spark disallows
    applyInPandasWithState after a streaming aggregation."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    series = _prepare_ttl_input(
        series, ts_col, state_ttl_ms, ttl_clock, watermark
    )
    out_schema = T.StructType(
        [
            T.StructField(series_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("level", T.DoubleType())])

    def fold(key, pdfs, state: GroupState):
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()  # dormant series evicted; restart on return
            return
        level = state.get[0] if state.exists else None
        # a group's micro-batch arrives as MULTIPLE Arrow chunks with no
        # cross-chunk ordering guarantee — concatenate, then ONE sort,
        # then fold ((ts, value) key: deterministic under ts ties)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((level,))
            _arm_ttl(state, state_ttl_ms, ttl_clock)
            return
        pdf = pd.concat(chunks).sort_values([ts_col, value_col])
        out = []
        for ds, yv in zip(pdf[ts_col], pdf[value_col]):
            yv = float(yv)
            level = yv if level is None else alpha * yv + (1 - alpha) * level
            out.append((key[0], ds, yv, level))
        state.update((level,))
        _arm_ttl(
            state, state_ttl_ms, ttl_clock,
            int(pdf[ts_col].max().value // 1_000_000),
        )
        yield pd.DataFrame(out, columns=[series_col, ts_col, value_col, "ewma"])

    return series.groupBy(series_col).applyInPandasWithState(
        fold, out_schema, state_schema, "append",
        _ttl_timeout_conf(state_ttl_ms, ttl_clock),
    )


def ewma_stream_tws(
    series: DataFrame,
    alpha: float = 0.3,
    series_col: str = SERIES,
    ts_col: str = DS,
    value_col: str = Y,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of :func:`ewma_stream` —
    Spark 4.x's arbitrary-state successor API. Two properties the
    GroupState path can't offer (SCALE.md round-11 adjudication):

      * state TTL WITHOUT liveness: ``ValueState(ttlDurationMs=...)``
        expires dormant-series state on its own — no processing-time
        timers, so a TTL'd query still terminates under
        Trigger.AvailableNow (the exact combination
        :func:`run_available_now` must REFUSE for ``ewma_stream``);
      * a long-lived Python worker per executor amortizes the
        ~0.2 ms/series per-group overhead that caps the GroupState
        path around 10^6 hot series per micro-batch.

    ENVIRONMENT-GATED: the TWS state protocol is protobuf-based and
    raises ImportError here if ``google.protobuf`` is not installed
    (this container: absent — the driver worker dies importing
    ``StateMessage_pb2``). Also requires the RocksDB state store:
    ``spark.conf.set("spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider")`` before starting the query.
    Semantics match ewma_stream: fold in (ts, value) order within each
    micro-batch, level carried across batches, expired/absent state
    re-initializes from the next value."""
    try:
        import google.protobuf  # noqa: F401  (TWS state protocol)
    except ImportError as e:
        raise ImportError(
            "ewma_stream_tws needs the 'protobuf' package "
            "(transformWithStateInPandas serializes state requests "
            "with it); install protobuf or use ewma_stream"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    out_schema = T.StructType(
        [
            T.StructField(series_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("level", T.DoubleType())])

    class _EwmaProcessor(StatefulProcessor):
        def init(self, handle):
            self._level = handle.getValueState(
                "level", state_schema, ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            level = self._level.get()[0] if self._level.exists() else None
            chunks = [p for p in rows if len(p)]
            if not chunks:
                return
            pdf = pd.concat(chunks).sort_values([ts_col, value_col])
            out = []
            for ds, yv in zip(pdf[ts_col], pdf[value_col]):
                yv = float(yv)
                level = (
                    yv if level is None
                    else alpha * yv + (1 - alpha) * level
                )
                out.append((key[0], ds, yv, level))
            self._level.update((level,))
            yield pd.DataFrame(
                out, columns=[series_col, ts_col, value_col, "ewma"]
            )

        def close(self):
            pass

    return series.groupBy(series_col).transformWithStateInPandas(
        statefulProcessor=_EwmaProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


def anomaly_stream(
    series: DataFrame,
    alpha: float = 0.1,
    z_thresh: float = 3.5,
    min_obs: int = 5,
    series_col: str = SERIES,
    ts_col: str = DS,
    value_col: str = Y,
    state_ttl_ms: int | None = None,
    ttl_clock: str = "processing",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming anomaly flags — the live twin of the batch residual
    detector (functions/stattests.anomalies_from_residuals): per
    series, an exponentially weighted mean/variance pair carried
    across micro-batches in GroupState; each arriving value is scored
    against the state BEFORE it is absorbed (an outlier must not mask
    itself), then folded in with the standard EW update
    (West 1979 / RiskMetrics):

        z      = (y − level) / sqrt(var / W)    [pre-update state]
        d      = y − level
        level += alpha·d
        var    = (1 − alpha)·(var + alpha·d²)

    where W = (1−alpha)·(1−(1−alpha)^m) is the recursion's cumulative
    weight after m updates — the Adam-style bias correction: the raw
    EW variance starts at 0 and carries only W of the true variance
    early on, which INFLATES warm-up z-scores by 1/sqrt(W) (measured:
    a clean N(0,1) stream false-flagged its 6th row at alpha=0.1
    without the correction).

    ``is_anomaly`` = |z| > z_thresh, suppressed for the first
    ``min_obs`` rows of a series (even corrected variance from 4
    points is noisy) and for zero variance (constant history ⇒ NULL
    z, same convention as the batch detector,
    functions/stattests.anomalies_from_residuals). State per series
    is three scalars — O(series) total, no growth with stream length;
    ``state_ttl_ms`` / ``ttl_clock`` / ``watermark`` bound state under
    series CHURN exactly as in :func:`ewma_stream` (dormant series
    evicted, reappearing ones restart their recursion; the 'event'
    clock composes with Trigger.AvailableNow). Same ordering caveat as
    :func:`ewma_stream` (event-time order
    within a batch, arrival order across; watermark upstream for late
    data)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    series = _prepare_ttl_input(
        series, ts_col, state_ttl_ms, ttl_clock, watermark
    )
    out_schema = T.StructType(
        [
            T.StructField(series_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("level", T.DoubleType()),
            T.StructField("var", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    cols = [series_col, ts_col, value_col, "level", "z", "is_anomaly"]

    def fold(key, pdfs, state: GroupState):
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()  # dormant series evicted; restart on return
            return
        level, var, n = state.get if state.exists else (None, 0.0, 0)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((level, var, n))
            _arm_ttl(state, state_ttl_ms, ttl_clock)
            return
        pdf = pd.concat(chunks).sort_values([ts_col, value_col])
        out = []
        for ds, yv in zip(pdf[ts_col], pdf[value_col]):
            yv = float(yv)
            if level is None:
                level, var, z, flag = yv, 0.0, None, False
            else:
                w = (1 - alpha) * (1 - (1 - alpha) ** (n - 1)) if n > 1 else 0.0
                z = (
                    (yv - level) / (var / w) ** 0.5
                    if var > 0 and w > 0 else None
                )
                flag = bool(
                    n >= min_obs and z is not None and abs(z) > z_thresh
                )
                d = yv - level
                level = level + alpha * d
                var = (1 - alpha) * (var + alpha * d * d)
            n += 1
            out.append((key[0], ds, yv, level, z, flag))
        state.update((level, var, n))
        _arm_ttl(
            state, state_ttl_ms, ttl_clock,
            int(pdf[ts_col].max().value // 1_000_000),
        )
        yield pd.DataFrame(out, columns=cols)

    return series.groupBy(series_col).applyInPandasWithState(
        fold, out_schema, state_schema, "append",
        _ttl_timeout_conf(state_ttl_ms, ttl_clock),
    )


def anomaly_stream_tws(
    series: DataFrame,
    alpha: float = 0.1,
    z_thresh: float = 3.5,
    min_obs: int = 5,
    series_col: str = SERIES,
    ts_col: str = DS,
    value_col: str = Y,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of :func:`anomaly_stream` —
    same EW mean/variance recursion with bias-corrected warm-up
    z-scores, carried in a TWS ValueState. Motivation and gating
    identical to :func:`ewma_stream_tws`: ValueState TTL expires
    dormant-series state without processing-time timers (composes
    with Trigger.AvailableNow), and the state protocol needs the
    protobuf package (absent in this container — raises ImportError
    at construction; SCALE.md round-11 adjudication). Requires the
    RocksDB state store provider conf before the query starts."""
    try:
        import google.protobuf  # noqa: F401  (TWS state protocol)
    except ImportError as e:
        raise ImportError(
            "anomaly_stream_tws needs the 'protobuf' package "
            "(transformWithStateInPandas serializes state requests "
            "with it); install protobuf or use anomaly_stream"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    out_schema = T.StructType(
        [
            T.StructField(series_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("level", T.DoubleType()),
            T.StructField("var", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    cols = [series_col, ts_col, value_col, "level", "z", "is_anomaly"]

    class _AnomalyProcessor(StatefulProcessor):
        def init(self, handle):
            self._st = handle.getValueState(
                "ewstate", state_schema, ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._st.exists():
                level, var, n = self._st.get()
            else:
                level, var, n = None, 0.0, 0
            chunks = [p for p in rows if len(p)]
            if not chunks:
                return
            pdf = pd.concat(chunks).sort_values([ts_col, value_col])
            out = []
            for ds, yv in zip(pdf[ts_col], pdf[value_col]):
                yv = float(yv)
                if level is None:
                    level, var, z, flag = yv, 0.0, None, False
                else:
                    w = (
                        (1 - alpha) * (1 - (1 - alpha) ** (n - 1))
                        if n > 1 else 0.0
                    )
                    z = (
                        (yv - level) / (var / w) ** 0.5
                        if var > 0 and w > 0 else None
                    )
                    flag = bool(
                        n >= min_obs and z is not None and abs(z) > z_thresh
                    )
                    d = yv - level
                    level = level + alpha * d
                    var = (1 - alpha) * (var + alpha * d * d)
                n += 1
                out.append((key[0], ds, yv, level, z, flag))
            self._st.update((level, var, int(n)))
            yield pd.DataFrame(out, columns=cols)

        def close(self):
            pass

    return series.groupBy(series_col).transformWithStateInPandas(
        statefulProcessor=_AnomalyProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


def ivfpq_encode_stream(
    docs: DataFrame,
    centroids_path: str,
    codebooks_path: str,
    dim: int = 64,
    residual: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PQ-encode a document firehose against a PERSISTED IVF-PQ index:
    the crawl-increment completion of cross_dedup's batch analogue.
    Nightly (or continuous), new documents stream in, get the
    hashing-trick embedding (embed.embed_docs_rowwise — row-local,
    stateless) and the (cell, pq_codes) encoding against the
    centroids/codebooks saved at index-build time
    (artifacts.save_centroids / save_pq_codebooks), so the serving
    code table grows by append without ever re-encoding the corpus.

    Every stage is a pure projection — no shuffle, no watermark, no
    state — so the plan runs in append mode with per-micro-batch cost
    proportional to the increment, and the SAME composition on a batch
    frame is bit-identical (integer-sum embeddings + literal-table
    encode; asserted in tests/test_pq_stream.py). Tokenless docs pass
    through with NULL embedding/cell/codes rather than being dropped —
    the downstream writer decides.

    100 TB posture: the driver holds only the index literals
    (n_cells·d + m·ksub·(d/m) floats ≈ a few hundred KB at production
    sizes); executors see one selectExpr chain inside codegen. Index
    REFRESH (retraining centroids on drifted data) is a batch concern:
    rebuild with kmeans_ivf_centroids/pq_codebooks_trained, save new
    artifacts, restart the stream — codes are versioned by artifact
    path.
    """
    from scalecast_spark.datapipe.artifacts import (
        load_centroids,
        load_pq_codebooks,
    )
    from scalecast_spark.datapipe.embed import embed_docs_rowwise
    from scalecast_spark.datapipe.similarity import ivfpq_encode

    cents = load_centroids(centroids_path)
    books = load_pq_codebooks(codebooks_path)
    emb = embed_docs_rowwise(
        docs.select(id_col, text_col), dim=dim,
        text_col=text_col, id_col=id_col,
    )
    return ivfpq_encode(emb, cents, books, residual=residual)


def ivfpq_search_stream(
    queries: DataFrame,
    codes_path: str,
    centroids_path: str,
    codebooks_path: str,
    results_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
    compact_every: int | None = None,
    **search_kwargs,
) -> DataFrame:
    """Serve a STREAM of query vectors against the persisted code
    table — the query-side completion of the crawl-increment story
    (ivfpq_encode_stream grows the table; this answers from it).

    Streaming DataFrames cannot run the per-query ranking window
    (row_number is unsupported in append mode), so each micro-batch
    of queries is handed to the BATCH operator via ``foreachBatch`` —
    the idiomatic stream-vs-static pattern: inside the callback the
    micro-batch is a plain batch frame, so
    :func:`~scalecast_spark.datapipe.similarity.ivfpq_search_batch`
    applies unchanged, keeping its scale shape (queries broadcast,
    dynamic partition pruning of the code-table scan, map-side
    WindowGroupLimit top-k) and its exact parity with single-query
    serve. Each micro-batch writes (idempotently overwrites on replay)
    its own ``batch_id=<n>`` parquet directory under ``results_path`` —
    per-micro-batch output is k rows per query, nothing driver-bound.

    This helper drains with Trigger.AvailableNow and returns the
    accumulated results as a batch frame (the house test pattern, cf.
    :func:`run_available_now`); a production deployment wires the
    same ``foreachBatch`` body under its own trigger/sink. Index
    refresh is a restart, same as ivfpq_encode_stream: codes and
    artifacts are versioned by path.

    ``compact_every=N`` turns on online sink compaction: every
    committed window of N ``batch_id`` directories collapses to one
    (crash-safe, exactly-once preserved — see
    :func:`_auto_compact_sink`), so a long-running stream holds
    ceil(n/N) result dirs instead of one per trigger."""
    from scalecast_spark.datapipe.artifacts import (
        load_centroids,
        load_pq_codebooks,
    )
    from scalecast_spark.datapipe.similarity import ivfpq_search_batch

    spark = queries.sparkSession
    _check_sink_paths("ivfpq_search_stream", spark, results_path,
                      checkpoint_dir)
    _check_compact_every(compact_every)
    # a crash mid-compaction must not hide staged rows from a resume
    # that omits compact_every — always finish pending work first
    _finish_pending_compactions(spark, results_path)
    cents = load_centroids(centroids_path)
    books = load_pq_codebooks(codebooks_path)
    codes = spark.read.parquet(codes_path)

    def _serve_batch(batch_df: DataFrame, batch_id: int) -> None:
        # online compaction first: touches only committed (< batch_id)
        # windows, so it cannot race this batch's replay
        _auto_compact_sink(spark, results_path, batch_id, compact_every)
        if batch_df.isEmpty():
            return
        # idempotent per-batch sink: each micro-batch owns (and on
        # replay OVERWRITES) its own batch_id=<n> directory, so a crash
        # between output and the commits/<n> WAL entry re-runs the
        # batch without duplicating rows — exactly-once end to end
        # (foreachBatch append to a shared dir is only at-least-once)
        (
            ivfpq_search_batch(codes, batch_df, cents, books, **search_kwargs)
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch_id={batch_id}")
        )

    q = (
        queries.writeStream.foreachBatch(_serve_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout with the query STILL
    # RUNNING — reading results then would return a partial (and, on a
    # reused results_path, stale) answer. Stop and fail loudly instead.
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"ivfpq_search_stream: drain did not finish within "
            f"{timeout_sec}s; partial results left at {results_path!r}. "
            f"To RESUME (keeping committed batches) rerun with the SAME "
            f"results_path and checkpoint_dir; to restart clean, use "
            f"fresh paths for BOTH."
        )
    # end-of-drain: every batch is committed, so the trailing window
    # compacts too — the drain ends at ceil(n/compact_every) dirs
    _auto_compact_sink(spark, results_path, float("inf"), compact_every)
    if not _hadoop_exists(spark, results_path):
        # zero-batch stream (empty queries source): never wrote
        # parquet — return an empty frame with the operator's true
        # result schema (derived from a zero-row batch plan)
        empty = spark.createDataFrame([], queries.schema)
        return ivfpq_search_batch(
            codes, empty, cents, books, **search_kwargs
        ).limit(0)
    # batch_id is sink plumbing (the idempotency key), not a result col
    return spark.read.parquet(results_path).drop("batch_id")


def cross_dedup_stream(
    new_docs: DataFrame,
    existing_docs_path: str,
    results_path: str,
    checkpoint_dir: str,
    existing_sigs_path: str | None = None,
    timeout_sec: int = 300,
    compact_every: int | None = None,
    **cross_kwargs,
) -> DataFrame:
    """Streamed incremental corpus dedup — the crawl-firehose twin of
    :func:`~scalecast_spark.datapipe.dedup.cross_dedup`: every
    micro-batch of NEW documents is deduplicated against the persisted
    training corpus, and only the survivors append to
    ``results_path``. This closes the nightly-refresh loop in
    streaming form the same way ivfpq_search_stream closes ANN serve:
    the batch operator IS the micro-batch body (``foreachBatch``, the
    idiomatic stream-vs-static pattern), so batch and streamed
    survivors are identical by construction — cross_dedup's keep/drop
    decision is per-new-doc against the existing side only, so
    splitting the new corpus across micro-batches cannot change any
    decision.

    Scale shape inherited from the batch operator: a micro-batch is a
    small increment by definition, so the default ``broadcast_new``
    turns the LSH bucket join into one streamed pass over the existing
    bands; pass ``existing_sigs_path`` (a persisted
    minhash_signatures output) so the training set is never
    re-shingled per batch — only re-SCANNED, column-pruned, for the
    candidate-driven verify. Same sink contract as ivfpq_search_stream
    (_check_sink_paths): results_path and checkpoint_dir travel
    together — both fresh for a new run, both reused to RESUME an
    interrupted drain (committed batches skip, appends continue),
    mismatched states fail fast; a timeout stops the query and raises
    rather than returning partial results. ``compact_every=N`` bounds
    the sink at ceil(n/N) batch directories (online compaction of
    committed windows, see :func:`_auto_compact_sink`)."""
    from scalecast_spark.datapipe.dedup import cross_dedup

    spark = new_docs.sparkSession
    _check_sink_paths("cross_dedup_stream", spark, results_path,
                      checkpoint_dir)
    _check_compact_every(compact_every)
    _finish_pending_compactions(spark, results_path)
    existing = spark.read.parquet(existing_docs_path)
    ex_sigs = (
        spark.read.parquet(existing_sigs_path)
        if existing_sigs_path is not None
        else None
    )

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        _auto_compact_sink(spark, results_path, batch_id, compact_every)
        if batch_df.isEmpty():
            return
        # idempotent per-batch sink — see ivfpq_search_stream: replay
        # of an uncommitted batch overwrites its own directory, closing
        # the at-least-once window of a shared append dir
        (
            cross_dedup(
                batch_df, existing, existing_sigs=ex_sigs, **cross_kwargs
            )
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch_id={batch_id}")
        )

    q = (
        new_docs.writeStream.foreachBatch(_dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"cross_dedup_stream: drain did not finish within "
            f"{timeout_sec}s; partial results left at {results_path!r}. "
            f"To RESUME (keeping committed batches) rerun with the SAME "
            f"results_path and checkpoint_dir; to restart clean, use "
            f"fresh paths for BOTH."
        )
    _auto_compact_sink(spark, results_path, float("inf"), compact_every)
    if not _hadoop_exists(spark, results_path):
        # zero-batch stream: survivors have the new_docs schema
        return spark.createDataFrame([], new_docs.schema)
    # batch_id is sink plumbing (the idempotency key), not a result col
    return spark.read.parquet(results_path).drop("batch_id")


def asof_join_stream(
    left_stream: DataFrame,
    right_path: str,
    results_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
    compact_every: int | None = None,
    **asof_kwargs,
) -> DataFrame:
    """Streaming twin of :func:`operators.joins.asof_join`: attach the
    most recent REFERENCE reading (a static, path-versioned right
    table — prices, configs, sensor calibrations) to every row of a
    firehose. The batch operator's union+window shape can't run on an
    unbounded stream (a non-time window over a stream is unsupported),
    so each micro-batch goes through the BATCH asof via ``foreachBatch``
    — the same stream-vs-static pattern as ivfpq_search_stream, with
    the same exactly-once sink contract (idempotent ``batch_id=<n>``
    dirs, commits/-gated resume via _check_sink_paths) and the same
    drain/timeout semantics. Right-table refresh is a restart with a
    new path, like index refreshes. Extra kwargs pass to asof_join
    (on/by/value_cols/direction/tolerance/suffix/allow_exact_matches).

    Per-batch cost: one keyed shuffle over (micro-batch ∪ right). For
    a right table much larger than the batch, pre-filter it to the
    batch's key set upstream or keep per-key right tables compact —
    the reference side is re-scanned per batch by design (it is the
    refreshable side). ``compact_every=N`` bounds the sink at
    ceil(n/N) batch directories (see :func:`_auto_compact_sink`)."""
    from scalecast_spark.operators.joins import asof_join

    spark = left_stream.sparkSession
    _check_sink_paths("asof_join_stream", spark, results_path,
                      checkpoint_dir)
    _check_compact_every(compact_every)
    _finish_pending_compactions(spark, results_path)
    right = spark.read.parquet(right_path)

    def _asof_batch(batch_df: DataFrame, batch_id: int) -> None:
        _auto_compact_sink(spark, results_path, batch_id, compact_every)
        if batch_df.isEmpty():
            return
        (
            asof_join(batch_df, right, **asof_kwargs)
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch_id={batch_id}")
        )

    q = (
        left_stream.writeStream.foreachBatch(_asof_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"asof_join_stream: drain did not finish within "
            f"{timeout_sec}s; partial results left at {results_path!r}. "
            f"To RESUME (keeping committed batches) rerun with the SAME "
            f"results_path and checkpoint_dir; to restart clean, use "
            f"fresh paths for BOTH."
        )
    _auto_compact_sink(spark, results_path, float("inf"), compact_every)
    if not _hadoop_exists(spark, results_path):
        empty = spark.createDataFrame([], left_stream.schema)
        return asof_join(empty, right, **asof_kwargs).limit(0)
    return spark.read.parquet(results_path).drop("batch_id")


def compact_results(
    spark: SparkSession,
    results_path: str,
    out_path: str,
    target_files: int = 1,
    keep_batch_id: bool = False,
) -> dict:
    """Compact a foreachBatch results directory into a serving table.

    The exactly-once sinks in this module write one ``batch_id=<n>``
    parquet directory per micro-batch (the idempotency key); a
    long-running stream therefore accumulates one small directory per
    trigger, and a consumer scan pays per-file open/footer costs that
    dwarf the data read (the same fragmentation ivfpq_compact fixes
    for cell-partitioned code tables). This rewrites the accumulated
    results as ``target_files`` parquet files at ``out_path``.

    Contract: an ARCHIVE/SERVING step for a finished (or paused)
    stream. The (results_path, checkpoint_dir) pair remains the
    resumable object — the original directory is left intact and a
    resumed stream keeps appending batch dirs THERE, not to out_path;
    swap consumers to out_path the same versioned-path way index
    refreshes swap (ivfpq_encode_stream docstring). ``batch_id`` is
    sink plumbing and is dropped unless ``keep_batch_id``. Row-count
    equality is verified before returning; out_path must be fresh.

    Uses coalesce (narrow, no shuffle): merging many small files needs
    no data movement beyond task assignment. Returns {files_before,
    files_after, bytes_before, bytes_after, rows}."""
    from scalecast_spark.datapipe.similarity import _fs_listing

    if results_path.rstrip("/") == out_path.rstrip("/"):
        raise ValueError(
            "compact_results: out_path must differ from results_path "
            "(Spark cannot rewrite its own input in place; use "
            "versioned paths)"
        )
    if _hadoop_exists(spark, out_path):
        raise FileExistsError(
            f"compact_results: out_path {out_path!r} already exists; "
            f"use a fresh versioned path"
        )
    if target_files < 1:
        raise ValueError(
            f"compact_results: target_files must be >= 1, got "
            f"{target_files}"
        )
    # a crash mid-auto-compaction leaves staged rows in a dot-dir the
    # reader would skip — promote them before counting anything
    _finish_pending_compactions(spark, results_path)
    df = spark.read.parquet(results_path)
    if "batch_id" not in df.columns:
        raise ValueError(
            f"compact_results: {results_path!r} has no batch_id "
            f"partition column — not a foreachBatch results directory "
            f"written by this module's sinks"
        )
    files_before, bytes_before = _fs_listing(spark, results_path)
    n_in = df.count()
    out = df if keep_batch_id else df.drop("batch_id")
    out.coalesce(target_files).write.mode("error").parquet(out_path)
    n_out = spark.read.parquet(out_path).count()
    if n_out != n_in:
        raise RuntimeError(
            f"compact_results: row count changed ({n_in} -> {n_out}); "
            f"out_path is suspect, do not swap consumers to it"
        )
    files_after, bytes_after = _fs_listing(spark, out_path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "rows": n_in,
    }
