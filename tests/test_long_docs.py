"""Long-document smoke tests: per-row operators must stay near-linear
in document length (the quality-classifier review found an O(tokens²)
array-concat fold — this guards the whole text family against that
class of bug). A 100k-token doc through each op with a wall cap: the
ops are O(n log n) per row, so seconds, not minutes."""

import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def long_doc(spark):
    # ~100k tokens with realistic repetition (cycle of 997 words)
    words = [f"w{i % 997}" for i in range(100_000)]
    text = " ".join(words)
    lines = "\n".join(
        " ".join(words[i : i + 12]) for i in range(0, 5000, 12)
    )
    return spark.createDataFrame(
        [(1, text), (2, lines), (3, "short doc here")], ["doc_id", "text"]
    )


def _timed(df):
    t = time.time()
    rows = df.collect()
    return time.time() - t, rows


def test_gopher_kernel_long_doc(spark, long_doc):
    from scalecast_spark.datapipe.text import add_gopher_signals_fast

    dt, rows = _timed(
        add_gopher_signals_fast(long_doc, include_base=True).select(
            "doc_id", "dup5gram_char_frac", "top2gram_frac"
        )
    )
    assert dt < 60, f"gopher kernel took {dt:.1f}s on a 100k-token doc"
    by_id = {r["doc_id"]: r for r in rows}
    # cycle of 997 repeats ~100x -> heavy 5-gram duplication
    assert by_id[1]["dup5gram_char_frac"] > 0.9


def test_chunking_long_doc(spark, long_doc):
    from scalecast_spark.datapipe.text import chunk_documents

    dt, rows = _timed(
        chunk_documents(long_doc, max_tokens=512, overlap=64).select(
            "doc_id", "chunk_idx", "chunk_tokens"
        )
    )
    assert dt < 60, f"chunking took {dt:.1f}s"
    n1 = len([r for r in rows if r["doc_id"] == 1])
    assert n1 == -(-100_000 // (512 - 64))  # ceil over stride


def test_quality_and_classifier_long_doc(spark, long_doc):
    from scalecast_spark.datapipe.quality_model import score_quality
    from scalecast_spark.datapipe.text import add_quality_score, curate_corpus

    dt, _ = _timed(add_quality_score(long_doc).select("doc_id", "q_score"))
    assert dt < 60, f"quality score took {dt:.1f}s"
    w = [0.01] * 257  # pretend weights; scoring path must stay linear
    dt, rows = _timed(score_quality(long_doc, w).select("doc_id", "q_model_score"))
    assert dt < 60, f"classifier scoring took {dt:.1f}s"
    assert all(r["q_model_score"] is not None for r in rows)
    dt, _ = _timed(curate_corpus(long_doc).select("doc_id", "keep"))
    assert dt < 90, f"curate_corpus took {dt:.1f}s"


def test_bpe_tokenize_long_doc(spark, long_doc):
    from scalecast_spark.datapipe.tokenizer import bpe_tokenize, train_bpe

    small = long_doc.filter("doc_id = 3")
    merges = train_bpe(small, vocab_size=40)
    dt, rows = _timed(
        bpe_tokenize(long_doc, merges).select("doc_id", "n_bpe_tokens")
    )
    assert dt < 60, f"bpe encode took {dt:.1f}s"
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
