"""JSON artifact persistence round-trips + envelope guards."""

import pytest

from scalecast_spark.datapipe import artifacts as A


def test_bpe_merges_roundtrip_and_apply(spark, tmp_path):
    from scalecast_spark.datapipe.tokenizer import bpe_tokenize, train_bpe

    df = spark.createDataFrame(
        [(1, "low lower lowest low low")], ["doc_id", "text"]
    )
    merges = train_bpe(df, vocab_size=20)
    p = str(tmp_path / "merges.json")
    A.save_bpe_merges(merges, p)
    loaded = A.load_bpe_merges(p)
    assert loaded == merges  # tuples restored, ORDER preserved
    a = bpe_tokenize(df, merges).first()["bpe_tokens"]
    b = bpe_tokenize(df, loaded).first()["bpe_tokens"]
    assert a == b


def test_classifier_weights_roundtrip_and_score(spark, tmp_path):
    from scalecast_spark.datapipe.quality_model import score_quality

    w = [0.1 * i for i in range(65)]
    p = str(tmp_path / "w.json")
    A.save_classifier_weights(w, p)
    assert A.load_classifier_weights(p) == w
    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    s1 = score_quality(df, w).first()["q_model_score"]
    s2 = score_quality(df, A.load_classifier_weights(p)).first()["q_model_score"]
    assert s1 == s2


def test_centroids_and_codebooks_roundtrip(spark, tmp_path):
    from scalecast_spark.datapipe.similarity import ivf_centroids, pq_codebooks

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids(emb, 4)
    books = pq_codebooks(emb, m=4, ksub=8)
    pc = str(tmp_path / "cents.json")
    pb = str(tmp_path / "books.json")
    A.save_centroids(cents, pc)
    A.save_pq_codebooks(books, pb)
    assert A.load_centroids(pc) == [(ci, list(v)) for ci, v in cents]
    assert A.load_pq_codebooks(pb) == [
        [(c, list(v)) for c, v in b] for b in books
    ]


def test_wrong_kind_fails_loudly(tmp_path):
    p = str(tmp_path / "w.json")
    A.save_classifier_weights([1.0, 2.0], p)
    with pytest.raises(ValueError, match="classifier_weights"):
        A.load_bpe_merges(p)
