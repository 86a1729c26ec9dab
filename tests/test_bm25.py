"""Okapi BM25 retrieval (datapipe/text.bm25_topk): hand-computed
scores, ranking semantics, and edge cases."""

import math

import pytest

from scalecast_spark.datapipe.text import bm25_topk


def test_hand_computed_score(spark):
    docs = [
        (1, "spark spark query"),
        (2, "table row column"),
        (3, "spark table"),
        (4, "query engine"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, ["spark"], k=4).collect()}
    # N=4, df_spark=2, idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    # avgdl = (3+3+2+2)/4 = 2.5
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 2.5)), 6)

    assert out[1] == pytest.approx(s(2, 3), abs=1e-6)
    assert out[3] == pytest.approx(s(1, 2), abs=1e-6)
    # docs without the term don't appear
    assert 2 not in out and 4 not in out


def test_multi_term_and_ranking(spark):
    docs = [
        (1, "spark query spark query"),
        (2, "spark other words here"),
        (3, "query lots of other words in this one"),
        (4, "nothing relevant"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = bm25_topk(df, ["spark", "query"], k=3).collect()
    assert [r["doc_id"] for r in rows][0] == 1  # both terms, high tf
    assert len(rows) == 3
    # descending scores
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_empty_query_raises(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(df, [])


def test_no_matches_yields_empty(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert bm25_topk(df, ["zzz"]).count() == 0
