"""BPE tokenizer (datapipe/tokenizer): hand-checked merges on a tiny
corpus, encode/train consistency, round-trip, corpus run."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.tokenizer import (
    EOW,
    bpe_tokenize,
    detokenize,
    encode_word,
    train_bpe,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_hand_checked_merges(spark):
    # Sennrich's canonical toy: low x5, lowest x2, newer x6, wider x3
    corpus = " ".join(
        ["low"] * 5 + ["lowest"] * 2 + ["newer"] * 6 + ["wider"] * 3
    )
    df = _df(spark, [corpus])
    merges = train_bpe(df, vocab_size=30)
    # first merge must be ('e','r▁') — count 9 (newer+wider), the
    # highest-frequency pair
    assert merges[0] == ("e", "r" + EOW)
    # 'lo' (count 7) appears among early merges
    assert ("l", "o") in merges[:4]


def test_encode_matches_training_segmentation(spark):
    corpus = " ".join(["abab"] * 10 + ["abcd"] * 3)
    df = _df(spark, [corpus])
    merges = train_bpe(df, vocab_size=12)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("abab", ranks)
    # the frequent word collapses to few symbols
    assert len(toks) <= 2
    assert detokenize(toks) == "abab"


def test_tokenize_roundtrip_and_counts(spark):
    texts = ["the cat sat", "the cat", "a wider cat sat low"]
    df = _df(spark, texts)
    merges = train_bpe(df, vocab_size=40)
    out = bpe_tokenize(df, merges).orderBy("doc_id").collect()
    for r, t in zip(out, texts):
        assert detokenize(r["bpe_tokens"]) == t
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
    # frequent words use fewer tokens than character count
    r0 = out[0]
    assert r0["n_bpe_tokens"] < len(texts[0].replace(" ", "")) + 1


def test_null_text_survives(spark):
    df = spark.createDataFrame([(1, None), (2, "ok ok")], "doc_id long, text string")
    merges = train_bpe(df.filter("text IS NOT NULL"), vocab_size=10)
    rows = {r["doc_id"]: r for r in bpe_tokenize(df, merges).collect()}
    assert rows[1]["bpe_tokens"] is None
    assert rows[2]["n_bpe_tokens"] >= 1


def test_corpus_compression(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(docs, vocab_size=300)
    assert len(merges) > 50
    out = bpe_tokenize(docs, merges)
    agg = out.agg(
        F.sum("n_bpe_tokens").alias("bpe"),
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("chars"),
    ).first()
    # learned merges compress well below characters on the training corpus
    assert agg["bpe"] < 0.5 * agg["chars"]
    # deterministic across runs
    assert merges == train_bpe(docs, vocab_size=300)
