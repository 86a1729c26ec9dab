"""hash_split / mix_sources / chunk_documents — deterministic dataset
construction operators."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.sample import hash_split, mix_sources
from scalecast_spark.datapipe.text import chunk_documents


def test_hash_split_partitions_and_determinism(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] == pytest.approx(1600, abs=120)
    assert counts["val"] == pytest.approx(200, abs=70)
    # every row in exactly one split, stable across runs
    assert out.count() == 2000
    again = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    assert out.exceptAll(again).count() == 0


def test_hash_split_validates(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, {}, "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, {"a": 0.9, "b": 0.3}, "doc_id")


def test_mix_sources_respects_allowances(spark):
    rows = [(i, "a" if i < 60 else "b", 10.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    out = mix_sources(df, {"a": 0.5, "b": 0.5}, 400.0, "n_tok", "doc_id")
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # each source gets 200.0 of budget -> 20 docs of 10 tokens
    assert per == {"a": 20, "b": 20}
    # unknown sources dropped
    out2 = mix_sources(df, {"a": 1.0}, 100.0, "n_tok", "doc_id")
    assert out2.filter(F.col("source") == "b").count() == 0
    # over-allocated group keeps everything
    out3 = mix_sources(df, {"b": 1.0}, 100000.0, "n_tok", "doc_id")
    assert out3.count() == 40


def test_chunk_documents_windows(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text, "x")], ["doc_id", "text", "meta"])
    out = chunk_documents(df, max_tokens=4, overlap=0).orderBy("chunk_idx").collect()
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[2]["chunk_text"] == "w8 w9"
    assert [r["chunk_tokens"] for r in out] == [4, 4, 2]
    assert out[0]["meta"] == "x"  # passthrough columns survive
    assert "text" not in out[0].asDict()


def test_chunk_documents_overlap_and_tail_rule(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = chunk_documents(df, max_tokens=8, overlap=4).orderBy("chunk_idx").collect()
    # starts 0, 4; start 8 is redundant (8+4 >= 10: covered by chunk 1)
    assert [r["chunk_idx"] for r in out] == [0, 1]
    assert out[1]["chunk_text"].split() == [f"w{i}" for i in range(4, 10)]
    assert out[1]["chunk_tokens"] == 6


def test_chunk_documents_edges(spark):
    df = spark.createDataFrame([(1, ""), (2, "one two")], ["doc_id", "text"])
    out = chunk_documents(df, max_tokens=5, overlap=1)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [2]
    assert rows[0]["chunk_text"] == "one two"
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)
