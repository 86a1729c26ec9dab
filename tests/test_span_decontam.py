"""Span-level benchmark decontamination (text.remove_contaminated_spans)
plus the chunk→pack training-batch construction path."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.text import (
    contaminated_spans,
    remove_contaminated_spans,
)

BENCH = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_spans_located_and_merged(spark):
    pre = "one two three four five six seven eight nine ten"
    post = "zz yy xx ww vv uu tt ss"
    doc = f"{pre} {BENCH} {post}"
    docs = _docs(spark, [(1, doc)])
    bench = _docs(spark, [(9, BENCH)])
    spans = contaminated_spans(docs, bench, n=8).collect()
    assert len(spans) == 1
    # benchmark occupies word positions 10..17
    assert (spans[0]["span_start"], spans[0]["span_end"]) == (10, 17)


def test_removal_cuts_exactly_the_span(spark):
    pre = "one two three four five six seven eight nine ten"
    post = "zz yy xx ww vv uu tt ss"
    doc = f"{pre} {BENCH} {post}"
    docs = _docs(spark, [(1, doc), (2, "totally clean words here")])
    bench = _docs(spark, [(9, BENCH)])
    out = {r["doc_id"]: r for r in remove_contaminated_spans(docs, bench, n=8).collect()}
    assert out[1]["text_decontam"] == f"{pre} {post}"
    assert out[1]["n_removed_tokens"] == 8
    # clean doc untouched (normalized form) with zero removals
    assert out[2]["text_decontam"] == "totally clean words here"
    assert out[2]["n_removed_tokens"] == 0


def test_multiple_hits_merge_into_one_span(spark):
    # benchmark text appears twice back to back -> overlapping windows
    # merge into ONE maximal span covering both occurrences
    doc = f"start {BENCH} {BENCH} finish"
    docs = _docs(spark, [(1, doc)])
    bench = _docs(spark, [(9, BENCH)])
    out = remove_contaminated_spans(docs, bench, n=8).first()
    assert out["text_decontam"] == "start finish"
    assert out["n_removed_tokens"] == 16


def test_chunk_then_pack_training_batches(spark):
    """End-to-end training-batch construction: chunk long docs to
    <=64-token windows, then greedily pack chunks into <=256-token
    bins — every chunk lands in exactly one bin and no bin overflows."""
    from scalecast_spark.datapipe.sample import pack_sequences
    from scalecast_spark.datapipe.text import chunk_documents

    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    chunks = chunk_documents(
        docs.select("doc_id", "text"), max_tokens=64, overlap=0
    ).withColumn(
        # 1e6 chunks/doc headroom: collisions would silently merge
        # keys and break the count assertion below
        "chunk_id",
        F.col("doc_id") * 1_000_000 + F.col("chunk_idx"),
    )
    weights = chunks.select(
        "chunk_id", F.col("chunk_tokens").cast("double").alias("w")
    )
    packed = pack_sequences(weights, 256.0, "w", "chunk_id")
    assert packed.count() == chunks.count()
    fill = (
        packed.join(weights, "chunk_id")
        .groupBy("bucket", "bin")
        .agg(F.sum("w").alias("fill"))
    )
    assert fill.filter(F.col("fill") > 256.0).count() == 0


def test_curate_corpus_cut_mode(spark):
    from scalecast_spark.datapipe.text import curate_corpus

    filler = " ".join(f"word{i}" for i in range(40))
    doc = f"{filler} {BENCH}"
    docs = _docs(spark, [(1, doc)])
    bench = _docs(spark, [(9, BENCH)])
    dropped = curate_corpus(docs, bench).select("doc_id", "keep", "drop_reasons")
    r = dropped.first()
    assert not r["keep"] and "benchmark_contaminated" in r["drop_reasons"]
    cut = curate_corpus(docs, bench, decontam_mode="cut")
    c = cut.first()
    assert c["keep"], c["drop_reasons"]  # survives on its cleaned merits
    assert c["text"] == filler  # benchmark span gone from the text
    assert c["n_removed_tokens"] == 8
    import pytest as _pt

    with _pt.raises(ValueError, match="decontam_mode"):
        curate_corpus(docs, bench, decontam_mode="nope")


def test_clean_docs_keep_bytes_and_cut_docs_keep_case(spark):
    """Text contract: untouched docs pass through verbatim (case AND
    newlines); cut docs rebuild from ORIGINAL-case tokens."""
    clean = "Hello World.\nSecond Line Here!"
    dirty = f"KEEP These Words {BENCH} And Tail"
    docs = _docs(spark, [(1, clean), (2, dirty)])
    bench = _docs(spark, [(9, BENCH)])
    out = {r["doc_id"]: r for r in remove_contaminated_spans(docs, bench, n=8).collect()}
    assert out[1]["text_decontam"] == clean  # bytes untouched
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["text_decontam"] == "KEEP These Words And Tail"  # case kept
    assert out[2]["n_removed_tokens"] == 8
    # re-running on a frame that already carries the outputs fails loudly
    with pytest.raises(ValueError, match="text_decontam"):
        remove_contaminated_spans(
            remove_contaminated_spans(docs, bench), bench
        )


def test_remove_duplicate_spans_keep_first(spark):
    """Lee 2022 ExactSubstr dedup ACTION: the lexicographically-first
    occurrence of a duplicated window survives byte-verbatim; later
    occurrences are cut with surrounding unique text preserved; clean
    docs are untouched bytes."""
    from scalecast_spark.datapipe.text import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "XX alpha beta gamma delta epsilon zeta eta theta iota kappa YY"),
            (3, "totally unique content here with no repeats at all okay fine"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, k=8, min_count=2).collect()
    }
    assert got[1]["n_dedup_removed"] == 0
    assert got[1]["text_dedup"] == docs.collect()[0]["text"]  # canonical
    assert got[2]["n_dedup_removed"] == 10
    assert got[2]["text_dedup"] == "XX YY"
    assert got[3]["n_dedup_removed"] == 0
    assert (
        got[3]["text_dedup"]
        == "totally unique content here with no repeats at all okay fine"
    )


def test_remove_duplicate_spans_cut_all(spark):
    """keep_first=False cuts EVERY occurrence (decontam semantics)."""
    from scalecast_spark.datapipe.text import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "XX alpha beta gamma delta epsilon zeta eta theta iota kappa YY"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, k=8, min_count=2, keep_first=False
        ).collect()
    }
    assert got[1]["n_dedup_removed"] == 10
    assert got[1]["text_dedup"] == ""
    assert got[2]["n_dedup_removed"] == 10
    assert got[2]["text_dedup"] == "XX YY"


def test_remove_duplicate_spans_accounting_matches_signals(spark, sf_dir):
    """On the real corpus with keep_first=False, the words each doc
    loses must equal add_duplication_signals' dup_span_words — the cut
    and the detector share one span definition."""
    from scalecast_spark.datapipe.text import (
        add_duplication_signals,
        remove_duplicate_spans,
    )
    from scalecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    cut = remove_duplicate_spans(docs, keep_first=False).select(
        "doc_id", "n_dedup_removed"
    )
    sig = add_duplication_signals(docs).select("doc_id", "dup_span_words")
    diff = (
        cut.join(sig, "doc_id")
        .filter("n_dedup_removed <> dup_span_words")
        .count()
    )
    assert diff == 0
    assert cut.filter("n_dedup_removed > 0").count() > 0


def test_remove_contaminated_spans_random_parity(spark):
    """Seeded-random adversarial parity: 40 docs over a tiny vocab
    (forcing overlapping/adjacent/full-doc spans) cut against a random
    benchmark slice must match a pure-Python reference implementation
    of the whole chain — benchmark n-gram set, positional hits,
    gap>n island merge, keep-word-iff-no-span-covers-it surgery, and
    the verbatim-bytes contract for untouched docs."""
    import random

    from scalecast_spark.datapipe.text import remove_contaminated_spans

    rng = random.Random(1234)
    vocab = [f"w{k}" for k in range(8)]
    n = 3
    docs = []
    for i in range(40):
        L = rng.randint(0, 25)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(L)]
        # mixed case + messy whitespace exercise the normalize/original
        # alignment (case folds for matching, original case survives)
        styled = [w.upper() if rng.random() < 0.3 else w for w in words]
        text = ("  " if i % 5 == 0 else "") + "  ".join(styled)
        docs.append((i, text))
    bench_ids = {i for i in range(40) if i % 7 == 0}

    def norm_words(text):
        return [w for w in " ".join(text.lower().split()).split(" ") if w]

    def orig_words(text):
        return [w for w in " ".join(text.split()).split(" ") if w]

    bench_grams = set()
    for i, text in docs:
        if i in bench_ids:
            w = norm_words(text)
            for p in range(len(w) - n + 1):
                bench_grams.add(" ".join(w[p:p + n]))

    expected = {}
    for i, text in docs:
        w = norm_words(text)
        hits = [p for p in range(len(w) - n + 1)
                if " ".join(w[p:p + n]) in bench_grams]
        # the engine's island rule: a new span starts when
        # pos > prev_pos + n; span end = last pos + n - 1
        spans = []
        prev = None
        for p in hits:
            if prev is None or p > prev + n:
                spans.append([p, p + n - 1])
            else:
                spans[-1][1] = max(spans[-1][1], p + n - 1)
            prev = p
        if not spans:
            expected[i] = (text, 0)
        else:
            ow = orig_words(text)
            kept = [ow[j] for j in range(len(ow))
                    if not any(s <= j <= e for s, e in spans)]
            expected[i] = (" ".join(kept), len(ow) - len(kept))

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    bench = df.filter(F.col("doc_id").isin(sorted(bench_ids)))
    got = {
        r["doc_id"]: (r["text_decontam"], r["n_removed_tokens"])
        for r in remove_contaminated_spans(df, bench, n=n).collect()
    }
    assert got == expected


def test_remove_duplicate_spans_random_parity(spark):
    """Seeded-random adversarial parity for the ExactSubstr cut,
    keep_first semantics: duplicated k-windows (count >= 2 over the
    corpus), the lexicographically-first (doc_id, pos) occurrence
    SURVIVES, every other occurrence's positions island-merge
    (gap > k breaks) and cut word-level. A tiny vocabulary forces
    heavy cross-doc duplication, overlapping windows, and
    full-document cuts."""
    import random

    from scalecast_spark.datapipe.text import remove_duplicate_spans

    rng = random.Random(99)
    vocab = [f"t{j}" for j in range(6)]
    k = 3
    docs = []
    for i in range(30):
        L = rng.randint(0, 18)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(L)]
        docs.append((i, " ".join(words)))

    def norm_words(text):
        return [w for w in " ".join(text.lower().split()).split(" ") if w]

    # corpus window census: gram -> occurrences [(doc, pos)]
    occ = {}
    for i, text in docs:
        w = norm_words(text)
        for p in range(len(w) - k + 1):
            occ.setdefault(" ".join(w[p:p + k]), []).append((i, p))
    dup = {g: sorted(ps) for g, ps in occ.items() if len(ps) >= 2}

    expected = {}
    for i, text in docs:
        w = norm_words(text)
        hits = sorted(
            p for p in range(len(w) - k + 1)
            if " ".join(w[p:p + k]) in dup
            and (i, p) != dup[" ".join(w[p:p + k])][0]  # canon survives
        )
        spans, prev = [], None
        for p in hits:
            if prev is None or p > prev + k:
                spans.append([p, p + k - 1])
            else:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            prev = p
        if not spans:
            expected[i] = (text, 0)
        else:
            ow = text.split()
            kept = [ow[j] for j in range(len(ow))
                    if not any(s <= j <= e for s, e in spans)]
            expected[i] = (" ".join(kept), len(ow) - len(kept))

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_dedup_removed"])
        for r in remove_duplicate_spans(df, k=k).collect()
    }
    assert got == expected
