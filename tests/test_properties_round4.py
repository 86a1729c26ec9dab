"""Property-based tests (hypothesis) for the round-4 operators:
randomized inputs verify invariants the fixed-fixture tests spot-check.
Few examples per property — each example is a Spark job."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

words_strategy = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4),
    min_size=0,
    max_size=40,
)


@given(words=words_strategy, mt=st.integers(2, 8), ov=st.integers(0, 3))
@settings(**SETTINGS)
def test_chunking_partitions_tokens(spark, words, mt, ov):
    """Chunks with overlap ov reproduce the token stream: chunk i
    starts at i·(mt−ov); with ov=0 concatenation equals the stream; a
    chunk is never empty; every chunk ≤ mt tokens."""
    ov = min(ov, mt - 1)
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    from scalecast_spark.datapipe.text import chunk_documents

    rows = chunk_documents(df, max_tokens=mt, overlap=ov).orderBy(
        "chunk_idx"
    ).collect()
    toks = [w for w in text.split() if w]
    if not toks:
        assert rows == []
        return
    stride = mt - ov
    for r in rows:
        got = r["chunk_text"].split()
        start = r["chunk_idx"] * stride
        assert got == toks[start : start + mt]
        assert 1 <= r["chunk_tokens"] == len(got) <= mt
    if ov == 0:
        flat = [w for r in rows for w in r["chunk_text"].split()]
        assert flat == toks
    # coverage: every token index falls inside some chunk
    covered = set()
    for r in rows:
        s = r["chunk_idx"] * stride
        covered.update(range(s, min(s + mt, len(toks))))
    assert covered == set(range(len(toks)))


@given(
    fr=st.tuples(
        st.floats(0.05, 0.9), st.floats(0.05, 0.5)
    ).filter(lambda t: t[0] + t[1] < 0.99),
    n=st.integers(50, 300),
)
@settings(**SETTINGS)
def test_hash_split_is_a_partition(spark, fr, n):
    from scalecast_spark.datapipe.sample import hash_split

    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    out = hash_split(df, {"a": fr[0], "b": fr[1], "c": 1 - fr[0] - fr[1]}, "doc_id")
    assert out.count() == n  # every row in exactly one split
    assert out.filter(F.col("split").isNull()).count() == 0
    # deterministic
    again = hash_split(df, {"a": fr[0], "b": fr[1], "c": 1 - fr[0] - fr[1]}, "doc_id")
    assert out.exceptAll(again).count() == 0


@given(
    seed=st.integers(0, 2**31 - 1),
    nbits=st.integers(0, 10),
)
@settings(**SETTINGS)
def test_hamming_pairs_exact_within_radius(spark, seed, nbits):
    """Pigeonhole banding finds EVERY pair within the radius and the
    reported distances are exact (vs python popcount)."""
    from scalecast_spark.datapipe.dedup import hamming_near_pairs

    rng = np.random.RandomState(seed)
    base = int(rng.randint(0, 1 << 62))
    v = base
    for b in rng.choice(64, nbits, replace=False):
        v ^= 1 << int(b)
    vals = [base, v - (1 << 64) if v >= 1 << 63 else v]
    df = spark.createDataFrame(
        [(i, int(x)) for i, x in enumerate(vals)], "doc_id long, h long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_pairs(df, "h", "doc_id", 64, 6).collect()
    }
    d = bin((vals[0] ^ vals[1]) & ((1 << 64) - 1)).count("1")
    if d <= 6:
        assert got == {(0, 1): d}
    else:
        assert got == {}


@given(texts=st.lists(st.text(alphabet="ab \n", max_size=60), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_gopher_kernel_parity_random_text(spark, texts):
    """Kernel twin stays bit-identical to the declarative Gopher
    signals on arbitrary (whitespace-heavy) text."""
    from scalecast_spark.datapipe.text import (
        add_gopher_signals,
        add_gopher_signals_fast,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    a = add_gopher_signals(df).drop("text").toPandas().set_index("doc_id").sort_index()
    b = (
        add_gopher_signals_fast(df)
        .drop("text").toPandas().set_index("doc_id").sort_index()
    )
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), (c, texts)


@given(words=st.lists(st.sampled_from(["lo", "low", "new", "wide", "er"]), min_size=4, max_size=30))
@settings(**SETTINGS)
def test_bpe_roundtrip_random(spark, words):
    from scalecast_spark.datapipe.tokenizer import (
        bpe_tokenize,
        detokenize,
        train_bpe,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = train_bpe(df, vocab_size=30)
    r = bpe_tokenize(df, merges).first()
    assert detokenize(r["bpe_tokens"]) == text
    assert r["n_bpe_tokens"] <= len(text.replace(" ", "")) + len(words)
