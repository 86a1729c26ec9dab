"""Scale probe: measure the dedup + curation pipelines against corpus
replicas at 1x / 4x / 16x to verify the near-linear scaling SCALE.md
claims (sub-quadratic candidate generation, no corpus-wide shuffles).

Replicas are built lazily in-plan (union of per-replica projections
with mutated text + offset ids — no files written): the `mutate` axis
appends a replica token so the duplicate RATE stays constant while the
corpus grows; `exact` replicas instead multiply the duplicate rate
(every doc becomes a 16-clique), stressing candidate-pair volume.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


ALPHA = "abcdefghijklmnopqrstuvwxyz"


def replicate(docs, factor: int, mutate: bool):
    parts = []
    for i in range(factor):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if mutate and i > 0:
            # rotate the alphabet per replica: every WORD differs, so
            # replicas share no shingles (a trailing-token mutation
            # would leave J≈0.9 and recreate the dup clique)
            rot = ALPHA[i % 25 + 1:] + ALPHA[: i % 25 + 1]
            p = p.withColumn("text", F.translate("text", ALPHA, rot))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dedup_pipeline(docs):
    from scalecast_spark.datapipe.dedup import (
        duplicate_clusters,
        jaccard_pairs_arrays,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_array,
        word_shingles,
    )

    sh = word_shingles(docs, 3)
    sigs = minhash_signatures(sh, n_hashes=4)
    cands = lsh_candidate_pairs(sigs, bands=4)
    base = docs.repartition(64, F.col("doc_id")).select(
        "doc_id", shingle_array(F.col("text"), 3).alias("_sh_arr")
    )
    pairs = jaccard_pairs_arrays(base, cands, min_jaccard=0.5)
    return duplicate_clusters(pairs.select("id_a", "id_b"))


def dedup_capped_pipeline(docs):
    """The round-5 hot-bucket cap under the clique stress: identical
    to dedup_pipeline but with max_bucket_size=8, so the exact-replica
    axis (every doc a 16-clique) emits min-id STARS instead of n²/2
    pairwise candidates — this pipeline runs the 16x clique corpus the
    uncapped one cannot."""
    from scalecast_spark.datapipe.dedup import (
        duplicate_clusters,
        jaccard_pairs_arrays,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_array,
        word_shingles,
    )

    sh = word_shingles(docs, 3)
    sigs = minhash_signatures(sh, n_hashes=4)
    cands = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=8)
    base = docs.repartition(64, F.col("doc_id")).select(
        "doc_id", shingle_array(F.col("text"), 3).alias("_sh_arr")
    )
    pairs = jaccard_pairs_arrays(base, cands, min_jaccard=0.5)
    return duplicate_clusters(pairs.select("id_a", "id_b"))


def curation_pipeline(docs):
    from scalecast_spark.datapipe.text import curate_corpus

    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return curate_corpus(docs, bench).select("doc_id", "keep", "drop_reasons")


def selection_pipeline(docs):
    """Corpus-selection ops (round 4): per-source cap, token-budget
    prefix (fixed budget — output shrinks as the corpus grows, but the
    scan+bucket-total cost is the scaling subject), sequence packing.
    One union + count materializes all three."""
    from scalecast_spark.datapipe.sample import (
        cap_per_group,
        pack_sequences,
        sample_to_token_budget,
    )

    capped = cap_per_group(docs, "source", 50, "doc_id")
    packed = pack_sequences(
        docs.select("doc_id", "n_chars"), 2048.0, "n_chars", "doc_id"
    )
    budget = sample_to_token_budget(
        docs.select("doc_id", "n_chars"), 60000.0, "n_chars", "doc_id"
    )
    return (
        capped.select("doc_id")
        .unionByName(packed.select("doc_id"))
        .unionByName(budget.select("doc_id"))
    )


def crossdedup_pipeline(docs):
    """Round-4 incremental dedup: treat half the corpus as the existing
    training set (signatures precomputed once, as a real refresh
    pipeline would persist them) and cross-dedup the other half
    against it. The scaling subject is the new×existing LSH bucket
    join + candidate verify."""
    from pyspark.sql import functions as F  # noqa: F811

    from scalecast_spark.datapipe.dedup import (
        cross_dedup,
        minhash_signatures,
        word_shingles,
    )

    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    ex_sigs = minhash_signatures(word_shingles(existing, 3), n_hashes=4)
    return cross_dedup(new, existing, existing_sigs=ex_sigs).select("doc_id")


def crossdedup_smj_pipeline(docs):
    """Round-10 axis (round-9 verdict #4): the SAME new×existing
    cross-dedup but with ``broadcast_new=False`` — the fallback
    contract for increments too large to broadcast, where the bucket
    join must survive as a shuffle join sized by AQE. The new side
    grows with the replica factor, so at 16x this is a genuinely
    large-increment refresh; near-linear sec/1x here is what licenses
    the documented "set False when the increment is huge" guidance."""
    from pyspark.sql import functions as F  # noqa: F811

    from scalecast_spark.datapipe.dedup import (
        cross_dedup,
        minhash_signatures,
        word_shingles,
    )

    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    ex_sigs = minhash_signatures(word_shingles(existing, 3), n_hashes=4)
    return cross_dedup(
        new, existing, existing_sigs=ex_sigs, broadcast_new=False
    ).select("doc_id")


def dedupcut_pipeline(docs):
    """Round-11 ExactSubstr dedup ACTION (text.remove_duplicate_spans,
    keep-first): detection shuffles carry 8-byte window hashes, the
    surgery is a per-row filter against each doc's few merged spans —
    wall time should track corpus size ~linearly on the mutate axis;
    the exact axis (every doc a 16-clique) stresses the hit volume
    (all-but-one copy of everything is removed)."""
    from pyspark.sql import functions as F  # noqa: F811

    from scalecast_spark.datapipe.text import remove_duplicate_spans

    return remove_duplicate_spans(docs).filter(F.col("n_dedup_removed") > 0)


def hamming_pipeline(docs):
    """Round-11 banded Hamming pigeonhole (dedup.hamming_near_pairs
    over 60-bit simhashes, radius 3): the signature projection is
    cached once (r11 fix), each band is an equi-join on small ints.
    Mutate axis = constant duplicate rate (pair volume ~linear); exact
    axis = every doc a 16-clique of IDENTICAL hashes — band buckets of
    16 replicas each, the hot-bucket stress the production default
    (no cap) must absorb as factor² pairs inside bounded families."""
    from scalecast_spark.datapipe.dedup import hamming_near_pairs, simhash

    return hamming_near_pairs(
        simhash(docs), "simhash", id_col="doc_id", bits=60, max_hamming=3
    )


def hamming_capped_pipeline(docs):
    """Same join with the hot-bucket star collapse
    (max_bucket_size=32): oversized band buckets emit hub-spoke pairs
    instead of cliques, so output and wall time stay ~linear in corpus
    size where the uncapped exact axis grows with factor²."""
    from scalecast_spark.datapipe.dedup import hamming_near_pairs, simhash

    return hamming_near_pairs(
        simhash(docs), "simhash", id_col="doc_id", bits=60, max_hamming=3,
        max_bucket_size=32,
    )


def signals_pipeline(docs):
    """Round-4 text additions: the Gopher char-fraction Arrow kernel +
    C4 structure signals + fixed-window chunking + a BM25 query — all
    per-row / query-vocab-bounded, so wall time should track corpus
    size ~linearly."""
    from scalecast_spark.datapipe.text import (
        add_c4_signals,
        add_gopher_signals_fast,
        bm25_topk,
        chunk_documents,
    )

    sig = add_c4_signals(add_gopher_signals_fast(docs)).select("doc_id")
    chunks = chunk_documents(
        docs.select("doc_id", "text"), max_tokens=40, overlap=8
    ).select("doc_id")
    top = bm25_topk(docs, ["query", "spark", "window"], k=10).select("doc_id")
    return sig.unionByName(chunks).unionByName(top)


def embed_pipeline(docs):
    """Hashing-trick doc embeddings (datapipe/embed.embed_docs): one
    token explode + one map-side-combined groupBy — the shuffle carries
    (id, dim longs) per doc, so wall time should track token volume
    ~linearly and never the pair count."""
    from scalecast_spark.datapipe.embed import embed_docs

    return embed_docs(docs).filter("embedding IS NOT NULL")


def replicate_emb(emb, factor: int):
    """Embedding replicas: offset ids; rotate dimensions per replica —
    rotation preserves within-replica norms and pairwise dots (same
    cluster/dup structure per copy) while cross-replica cosines stay
    unstructured, so near-dup volume grows linearly, not as cliques."""
    parts = []
    for i in range(factor):
        p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        if i > 0:
            k = (i * 7) % 63 + 1
            p = p.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", k + 1, 64 - k),
                    F.slice("embedding", 1, k),
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def embeddings_pipeline(emb):
    """Round-4 embedding ops under one count: Lloyd k-means (2 iters)
    + SemDeDup marking (per-cluster GEMM) + an IVF-PQ ANN query.
    k-means/SemDeDup are the scaling subjects (scan-side assignment +
    cluster-bounded GEMMs); the ANN query cost is dominated by its
    fixed quantizer build."""
    from pyspark.sql import functions as F  # noqa: F811

    from scalecast_spark.datapipe.cluster import (
        kmeans_embeddings,
        semantic_dedup,
    )
    from scalecast_spark.datapipe.similarity import ivfpq_topk

    assigned = kmeans_embeddings(emb, k=8, n_iter=2, vectorized=True)
    marked = semantic_dedup(emb, threshold=0.4, assigned=assigned)
    q = emb.select("embedding").limit(1).collect()[0][0]
    top = ivfpq_topk(emb, [float(x) for x in q], k=10)
    return marked.select("vec_id").unionByName(top.select("vec_id"))


#: Iterative index/model BUILDERS: wall-time per input row is the
#: scale signal the plan-marker audit cannot see — the round-6
#: pq_codebooks_trained regression (~34 ms/row, 87 s of the sf0.1
#: bench) passed every 0-rowUDF / no-NLJ check because the damage was
#: per-row interpreted-expression cost on a clean-looking plan.
#: Floors are input rows/sec on the 16x replica corpus (fixed plan-
#: compile cost amortized), set ~10x under the measured post-fix
#: throughput and ~100x ABOVE the regressed one, so the probe fails
#: loudly on a reintroduced per-row expression stack without tripping
#: on host jitter. Round-8 measurements at 16x (32k vectors, 64-dim):
#: pq_train ~5.5k rows/s (regressed round-6 code: ~30 rows/s),
#: kmeans_train ~12k rows/s.
TRAINER_FLOORS = {"pq_train": 700.0, "kmeans_train": 900.0}


def pq_train_builder(emb):
    """2 Lloyd iterations of residual PQ codebook training (the
    round-6 regression site, similarity.pq_codebooks_trained)."""
    from scalecast_spark.datapipe.similarity import (
        ivf_centroids,
        pq_codebooks_trained,
    )

    cents = ivf_centroids(emb, 8, "embedding", "vec_id")
    books = pq_codebooks_trained(
        emb, 8, 16, 2, "embedding", "vec_id", cents=cents
    )
    return sum(len(b) for b in books)


def kmeans_train_builder(emb):
    """2 Lloyd iterations of full-vector k-means
    (cluster.kmeans_embeddings vectorized path)."""
    from scalecast_spark.datapipe.cluster import kmeans_embeddings

    return kmeans_embeddings(emb, k=8, n_iter=2, vectorized=True).count()


def stream_state_probe(spark, scratch, n_series: int = 100_000) -> bool:
    """Round-10 probe (round-9 verdict #8): GroupState footprint and
    per-batch latency of the applyInPandasWithState operators
    (ewma_stream / anomaly_stream) at many-series scale. Two
    micro-batches over the SAME 1e5-series universe must leave
    EXACTLY n_series state rows (state is keyed by series — bounded
    by |series|, not stream length), and the second batch — the one
    paying a 1e5-row state-store read-modify-write — must not blow up
    vs the first. Reported from Spark's own progress telemetry
    (stateOperators.numRowsTotal / durationMs.triggerExecution), not
    wall-clock guesses."""
    from pyspark.sql import functions as F  # noqa: F811

    from scalecast_spark.streaming.ops import anomaly_stream, ewma_stream

    indir = f"{scratch}/ss_in"
    base = spark.range(n_series).select(
        F.concat(F.lit("s"), F.col("id")).alias("series_id"),
        F.col("id"),
    )
    for b in range(2):
        (
            base.select(
                "series_id",
                F.to_timestamp(F.lit(f"2024-01-0{b + 1}")).alias("ds"),
                (F.sin(F.col("id") * 0.7 + b) * 10.0).alias("y"),
            )
            .coalesce(1)  # ONE file per write -> maxFilesPerTrigger=1
            .write.mode("append").parquet(indir)  # gives 2 micro-batches
        )
    ok = True
    print(f"\nstreaming GroupState probe ({n_series} series x 2 "
          f"micro-batches; state must stay == n_series)")
    print(f"{'operator':<16} {'batch':>5} {'in_rows':>8} {'state_rows':>10} "
          f"{'state_MB':>8} {'batch_sec':>9}  verdict")
    for name, op in [("ewma_stream", ewma_stream),
                     ("anomaly_stream", anomaly_stream)]:
        src = (
            spark.readStream
            .schema("series_id string, ds timestamp, y double")
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        q = (
            op(src).writeStream.format("noop")
            .option("checkpointLocation", f"{scratch}/ss_ckpt_{name}")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            print(f"{name:<16} TIMED OUT")
            return False
        progs = [p for p in q.recentProgress
                 if p["numInputRows"] and p["stateOperators"]]
        for i, p in enumerate(progs):
            so = p["stateOperators"][0]
            rows_total = so["numRowsTotal"]
            mb = so.get("memoryUsedBytes", 0) / 1e6
            sec = p["durationMs"]["triggerExecution"] / 1e3
            good = rows_total == n_series
            ok = ok and good
            print(f"{name:<16} {i + 1:>5} {p['numInputRows']:>8} "
                  f"{rows_total:>10} {mb:>8.1f} {sec:>9.2f}  "
                  f"{'ok' if good else 'FAIL (state grew past |series|)'}",
                  flush=True)
        if len(progs) != 2:
            print(f"{name:<16} expected 2 stateful batches, saw "
                  f"{len(progs)} — FAIL")
            ok = False

    # round-11 churn leg: SERIES CHURN is the axis O(|series|) does
    # not cover — an open-world key space (one series per user/crawl
    # host) grows state forever without eviction. Three batches:
    # 1e5 's*' series at day 1, a DISJOINT 1e5 't*' universe at day
    # 40, then day 41 (the watermark now far past day1 + TTL fires
    # the s* event-time timers). With ttl_clock='event' (5-day TTL,
    # 1-day watermark) the final state must be |t| = n_series — the
    # dormant universe evicted by the WATERMARK under an AvailableNow
    # drain, the exact combination the processing-time clock cannot
    # serve (it would hang the drain).
    import time as _time

    churn_in = f"{scratch}/ss_churn_in"
    for prefix, day in [("s", "2024-01-01"), ("t", "2024-02-09"),
                        ("t", "2024-02-10")]:
        (
            base.select(
                F.concat(F.lit(prefix), F.col("id")).alias("series_id"),
                F.to_timestamp(F.lit(day)).alias("ds"),
                (F.col("id") % 97).cast("double").alias("y"),
            )
            .coalesce(1)
            .write.mode("append").parquet(churn_in)
        )
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    from scalecast_spark.streaming.ops import ewma_stream as _ewma

    src = (
        spark.readStream
        .schema("series_id string, ds timestamp, y double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(churn_in)
    )
    q = (
        _ewma(src, state_ttl_ms=5 * 86_400_000, ttl_clock="event",
              watermark="1 day")
        .writeStream.format("noop")
        .option("checkpointLocation", f"{scratch}/ss_ckpt_churn")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        print("churn leg TIMED OUT — event-TTL drain did not terminate")
        return False
    progs = [p for p in q.recentProgress
             if p["numInputRows"] and p["stateOperators"]]
    print(f"\nevent-TTL churn leg (2x {n_series}-series disjoint "
          f"universes; final state must drop back to {n_series})")
    want_rows = [n_series, 2 * n_series, n_series]
    for i, p in enumerate(progs):
        so = p["stateOperators"][0]
        rows_total = so["numRowsTotal"]
        good = i < len(want_rows) and rows_total == want_rows[i]
        ok = ok and good
        print(f"{'ewma_event_ttl':<16} {i + 1:>5} {p['numInputRows']:>8} "
              f"{rows_total:>10} "
              f"{so.get('memoryUsedBytes', 0) / 1e6:>8.1f} "
              f"{p['durationMs']['triggerExecution'] / 1e3:>9.2f}  "
              f"{'ok' if good else 'FAIL (eviction did not track churn)'}",
              flush=True)
    if len(progs) != 3:
        print(f"churn leg expected 3 batches, saw {len(progs)} — FAIL")
        ok = False
    return ok


def trainer_probe(spark, sf_dir, scratch) -> bool:
    """Throughput floor for iterative builders; returns True if every
    trainer clears its TRAINER_FLOORS rows/sec on the 16x replica."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e0 = emb.count()
    path = f"{scratch}/trainer_16"
    replicate_emb(emb, 16).repartition(32).write.mode("overwrite").parquet(path)
    d = spark.read.parquet(path)
    rows = e0 * 16
    ok = True
    print(f"\ntrainer-throughput floor (16x = {rows} vectors; "
          f"min of 2 runs; FAIL below floor)")
    print(f"{'trainer':<14} {'sec':>7} {'rows/s':>9} {'floor':>7}  verdict")
    for name, fn in [("pq_train", pq_train_builder),
                     ("kmeans_train", kmeans_train_builder)]:
        dt = min(_timed(lambda x: _as_counted(fn, x), d)[0] for _ in range(2))
        rps = rows / dt
        floor = TRAINER_FLOORS[name]
        verdict = "ok" if rps >= floor else "FAIL (scale-killer)"
        ok = ok and rps >= floor
        print(f"{name:<14} {dt:>7.2f} {rps:>9.0f} {floor:>7.0f}  {verdict}",
              flush=True)
    return ok


def _fs_bytes_read(spark) -> int:
    """Process-wide bytes read through Hadoop's local FileSystem —
    REAL I/O, not plan markers. local[*] runs executors in this JVM,
    so the delta across a query is exactly what its scans read
    (shuffle files bypass the Hadoop FS and don't pollute it)."""
    it = (
        spark._jvm.org.apache.hadoop.fs.FileSystem
        .getGlobalStorageStatistics().iterator()
    )
    total = 0
    while it.hasNext():
        s = it.next()
        if s.getScheme() == "file":
            v = s.getLong("bytesRead")
            total += int(v) if v else 0
    return total


def serve_probe(spark, sf_dir, scratch) -> bool:
    """I/O proportionality of the ANN serve paths (round-9, VERDICT r8
    #5): bytes READ by a search against the cell-partitioned code
    table must scale with nprobe/n_cells — the probed fraction — not
    with the corpus. Measured with Hadoop FS byte counters, so the
    partition-pruning claim is a measurement, not an inference from
    PushedFilters markers. Probes the 16x replica corpus (same scale
    posture as the trainer floor)."""
    from scalecast_spark.datapipe.similarity import (
        ivf_centroids,
        ivfpq_encode,
        ivfpq_search,
        ivfpq_search_batch,
        pq_codebooks_trained,
    )

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path16 = f"{scratch}/serve_emb16"
    replicate_emb(emb0, 16).repartition(32).write.mode(
        "overwrite"
    ).parquet(path16)
    emb = spark.read.parquet(path16)
    n_cells = 16
    cents = ivf_centroids(emb, n_cells, "embedding", "vec_id")
    books = pq_codebooks_trained(
        emb, 8, 16, 1, "embedding", "vec_id", cents=cents
    )
    codes_path = f"{scratch}/serve_codes"
    ivfpq_encode(emb, cents, books).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    table_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(codes_path)
        for f in fs
    )
    qv = [
        float(x)
        for x in emb.orderBy("vec_id").select("embedding").limit(1)
        .collect()[0][0]
    ]

    def measure(fn) -> int:
        b0 = _fs_bytes_read(spark)
        fn()
        return _fs_bytes_read(spark) - b0

    # warm the file-listing caches outside the timers/counters
    codes.count()
    got = {}
    for nprobe in (1, 4, n_cells):
        got[nprobe] = measure(
            lambda np_=nprobe: ivfpq_search(
                codes, cents, books, qv, k=10, nprobe=np_
            ).collect()
        )
    import numpy as np

    qdf = (
        emb.orderBy("vec_id").limit(8)
        .selectExpr("vec_id AS query_id", "embedding")
    )
    # the probed-cell UNION these 8 queries legitimately need (driver
    # recompute of the operator's own top-nprobe ranking) — the batch
    # scan must read THIS fraction, not the whole table
    union = set()
    for r in qdf.collect():
        v = np.asarray([float(x) for x in r["embedding"]])
        ranked = sorted(
            cents, key=lambda c: (-float(np.dot(v, np.asarray(c[1]))), c[0])
        )
        union |= {ci for ci, _ in ranked[:2]}
    qside = measure(lambda: qdf.collect())
    batch_bytes = measure(
        lambda: ivfpq_search_batch(
            codes, qdf, cents, books, k=10, nprobe=2
        ).collect()
    )
    full = got[n_cells]
    print(f"\nserve-path I/O proportionality (16x = {emb.count()} vectors, "
          f"{n_cells} cells, code table {table_bytes / 1e6:.1f} MB on "
          f"disk, {full / 1e6:.2f} MB of ADC columns after column "
          f"pruning)")
    print(f"{'probe':<22} {'bytes_read':>11} {'of_full_scan':>13}")
    for nprobe in (1, 4, n_cells):
        print(f"nprobe={nprobe:<15} {got[nprobe]:>11} "
              f"{got[nprobe] / full:>12.1%}")
    print(f"{'batch Q=8 nprobe=2':<22} {batch_bytes:>11} "
          f"{batch_bytes / full:>12.1%}  (probed union "
          f"{len(union)}/{n_cells} cells = {len(union) / n_cells:.0%} "
          f"expected + 2x query-side {qside}B: the DPP subquery "
          f"re-executes the broadcast side)")
    # proportionality: a 1-cell probe reads ~1/16 of the ADC columns
    # (cell skew + footers bounded by the slack), 4 cells ~4x that,
    # and the batch path's code-table scan reads ONLY the probed-cell
    # union (dynamic partition pruning, measured not inferred)
    ok = (
        got[1] <= full / 3
        and got[4] <= full * (4 / n_cells) * 2.5
        and got[1] < got[4] < full
        and batch_bytes <= full * (len(union) / n_cells) * 1.3 + 3 * qside
    )
    if not ok:
        print("SERVE I/O NOT PROPORTIONAL — a probed search read more "
              "of the code table than nprobe/n_cells allows")
    return ok


def delete_probe(spark, sf_dir, scratch) -> bool:
    """Accounting proportionality of ivfpq_delete_ids (round-10
    verdict #4): with the r11 rework, everything EXCEPT the one
    column-pruned (id, cell) locate scan must cost the same at 16x
    the table — touched-cell rewrite, pruned counts, and listing
    fingerprints are all delete-sized. Measured with Hadoop FS byte
    counters at 1x vs 16x replicas, same 8-id single-cell delete:
    bytes_other = total delete I/O minus a separately-measured locate
    pass must stay ~flat while bytes_locate grows with the table."""
    from scalecast_spark.datapipe.similarity import (
        ivf_centroids,
        ivfpq_delete_ids,
        ivfpq_encode,
        pq_codebooks_trained,
    )

    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_cells = 16
    cents = ivf_centroids(emb0, n_cells, "embedding", "vec_id")
    books = pq_codebooks_trained(
        emb0, 8, 16, 1, "embedding", "vec_id", cents=cents
    )

    def measure(fn):
        b0, t0 = _fs_bytes_read(spark), time.time()
        out = fn()
        return out, _fs_bytes_read(spark) - b0, time.time() - t0

    rows = {}
    for factor in (1, 16):
        src = f"{scratch}/del_codes_{factor}x"
        codes = ivfpq_encode(replicate_emb(emb0, factor), cents, books)
        codes.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(src)
        table_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(src)
            for f in fs
        )
        table = spark.read.parquet(src)
        table.count()  # warm listing caches outside the counters
        one_cell = int(table.groupBy("cell").count()
                       .orderBy(F.desc("count")).first()["cell"])
        victims = [
            int(r["vec_id"])
            for r in table.filter(F.col("cell") == one_cell)
            .select("vec_id").orderBy("vec_id").limit(8).collect()
        ]
        # the locate pass alone (the component ALLOWED to grow):
        id_df = spark.createDataFrame(
            [(i,) for i in victims], "vec_id long"
        )
        _, locate_bytes, _ = measure(
            lambda: table.select("vec_id", "cell")
            .join(F.broadcast(id_df), "vec_id")
            .groupBy("vec_id")
            .agg(F.count("*"), F.collect_set("cell"))
            .collect()
        )
        stats, copy_bytes, copy_sec = measure(
            lambda: ivfpq_delete_ids(
                spark, src, f"{scratch}/del_codes_{factor}x_v2", victims
            )
        )
        assert stats["rows_deleted"] == 8 and stats["cells_touched"] == 1
        # the rename fast path (move_untouched=True) — metadata-only
        # transfer of untouched cells; DESTROYS src, so it runs last
        mstats, move_bytes, move_sec = measure(
            lambda: ivfpq_delete_ids(
                spark, src, f"{scratch}/del_codes_{factor}x_v3", victims,
                move_untouched=True,
            )
        )
        assert mstats["untouched_transfer"] == "rename"
        rows[factor] = (
            table_bytes, locate_bytes,
            copy_bytes - locate_bytes, copy_sec,
            move_bytes - locate_bytes, move_sec,
        )
    print("\ndelete accounting proportionality (8-id single-cell "
          "delete; *_other = I/O beyond the locate scan)")
    print(f"{'factor':>6} {'table_MB':>9} {'locate_MB':>10} "
          f"{'copy_other_MB':>14} {'move_other_MB':>14} {'sec':>6}")
    for f_, (tb, lb, cb, _cs, mb, ms) in rows.items():
        print(f"{f_:>6} {tb / 1e6:>9.1f} {lb / 1e6:>10.2f} "
              f"{cb / 1e6:>14.2f} {mb / 1e6:>14.2f} {ms:>6.1f}")
    # move_untouched: non-locate I/O must NOT scale with the table
    # (3x slack for footer/listing noise against 16x data growth);
    # copy mode is EXPECTED to read ~the untouched bytes on local FS —
    # the documented reason the fast path exists (server-side copy on
    # object stores pays it on the store, not the client)
    ok = (
        rows[16][4] <= rows[1][4] * 3
        and rows[16][2] > rows[16][4] * 2  # copy really pays the bytes
    )
    if not ok:
        print("DELETE ACCOUNTING NOT PROPORTIONAL — non-locate I/O of "
              "the rename path grew with the table")
    return ok


class _Counted:
    def __init__(self, n):
        self._n = n

    def count(self):
        return self._n


def _as_counted(fn, d):
    return _Counted(fn(d))


def main():
    import shutil

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # optional positional filters: probe only the named pipelines
    # ("embedding", "trainers", "serve", "streamstate" name the
    # non-docs blocks). Unknown names are an ERROR — a typo must not
    # skip every probe and exit 0 as a green run.
    known = {"dedup", "dedup_cap", "curation", "selection", "signals",
             "embed", "crossdedup", "crossd_smj", "dedupcut", "hamming",
             "hamming_cap",
             "embedding", "trainers", "serve", "streamstate", "delete"}
    only = set(sys.argv[2:])
    unknown = only - known
    if unknown:
        print(f"unknown probe name(s) {sorted(unknown)}; "
              f"known: {sorted(known)}")
        sys.exit(2)
    want = lambda name: not only or name in only  # noqa: E731
    scratch = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".probe_tmp")
    from scalecast_spark import get_session

    spark = get_session("scale-probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"base corpus: {n0} docs ({sf_dir}); min of 2 runs per cell")
    print(f"{'pipeline':<10} {'axis':<7} {'factor':>6} {'docs':>8} "
          f"{'out_rows':>9} {'sec':>7} {'sec/1x':>7}")
    try:
        for name, fn in [("dedup", dedup_pipeline),
                         ("dedup_cap", dedup_capped_pipeline),
                         ("curation", curation_pipeline),
                         ("selection", selection_pipeline),
                         ("signals", signals_pipeline),
                         ("dedupcut", dedupcut_pipeline),
                         ("hamming", hamming_pipeline),
                         ("hamming_cap", hamming_capped_pipeline),
                         ("embed", embed_pipeline),
                         ("crossdedup", crossdedup_pipeline),
                         ("crossd_smj", crossdedup_smj_pipeline)]:
            if not want(name):
                continue
            for axis, mutate in [("mutate", True), ("exact", False)]:
                if name in ("curation", "selection", "signals", "embed",
                            "crossdedup", "crossd_smj") and axis == "exact":
                    continue  # per-row/bucketed; dup rate is irrelevant
                if name in ("dedup_cap", "hamming_cap") and axis == "mutate":
                    continue  # same plan as the uncapped twin below the cap
                if name == "dedup" and axis == "exact":
                    factors = (1, 4)  # 16x exact = 600k-pair clique graph
                else:
                    # dedup_cap exact runs the full 16x clique corpus:
                    # the round-5 star collapse keeps candidates O(n)
                    factors = (1, 4, 16)
                base_t = None
                for factor in factors:
                    # materialize the replica corpus once: a realistic
                    # multi-partition parquet scan, and the pipeline
                    # plan stays IDENTICAL across factors (a 16-branch
                    # in-plan union would grow compile time with factor)
                    path = f"{scratch}/{axis}_{factor}"
                    replicate(docs, factor, mutate).repartition(32).write.mode(
                        "overwrite"
                    ).parquet(path)
                    d = spark.read.parquet(path)
                    dt, out_rows = min(
                        _timed(fn, d) for _ in range(2)
                    )
                    base_t = base_t or dt
                    print(f"{name:<10} {axis:<7} {factor:>6} {n0 * factor:>8} "
                          f"{out_rows:>9} {dt:>7.2f} {dt / base_t:>7.2f}",
                          flush=True)
        if want("embedding"):
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            e0 = emb.count()
            base_t = None
            for factor in (1, 4, 16):
                path = f"{scratch}/emb_{factor}"
                replicate_emb(emb, factor).repartition(32).write.mode(
                    "overwrite"
                ).parquet(path)
                d = spark.read.parquet(path)
                dt, out_rows = min(
                    _timed(embeddings_pipeline, d) for _ in range(2)
                )
                base_t = base_t or dt
                print(f"{'embedding':<10} {'rotate':<7} {factor:>6} "
                      f"{e0 * factor:>8} {out_rows:>9} {dt:>7.2f} "
                      f"{dt / base_t:>7.2f}", flush=True)
        trainers_ok = trainer_probe(spark, sf_dir, scratch) \
            if want("trainers") else True
        serve_ok = serve_probe(spark, sf_dir, scratch) \
            if want("serve") else True
        state_ok = stream_state_probe(spark, scratch) \
            if want("streamstate") else True
        delete_ok = delete_probe(spark, sf_dir, scratch) \
            if want("delete") else True
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    if not trainers_ok:
        print("\nTRAINER FLOOR VIOLATED — an iterative builder fell "
              "below its rows/sec floor (see TRAINER_FLOORS docstring)")
        sys.exit(1)
    if not state_ok:
        print("\nSTREAM STATE PROBE FAILED — GroupState grew past the "
              "series universe or a drain timed out")
        sys.exit(1)
    if not serve_ok:
        sys.exit(1)
    if not delete_ok:
        print("\nDELETE ACCOUNTING PROBE FAILED — non-locate I/O grew "
              "with the table (see delete_probe docstring)")
        sys.exit(1)


def _timed(fn, d):
    t = time.time()
    out_rows = fn(d).count()
    return time.time() - t, out_rows


if __name__ == "__main__":
    main()
