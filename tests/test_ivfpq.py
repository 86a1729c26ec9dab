"""IVF-PQ ANN (datapipe/similarity.ivfpq_topk): structure, recall vs
the brute-force baseline, determinism, and guardrails."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.similarity import (
    cosine_topk,
    ivfpq_topk,
    pq_codebooks,
)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _query(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return emb, [float(x) for x in q]


def test_codebook_shape(spark):
    emb = _emb(spark)
    books = pq_codebooks(emb, m=8, ksub=16)
    assert len(books) == 8
    for book in books:
        assert len(book) == 16
        assert [c for c, _ in book] == list(range(1, 17))
        assert all(len(v) == 8 for _, v in book)


def test_dim_not_divisible_raises(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(emb, m=7)


def test_recall_vs_brute(spark):
    emb, q = _query(spark)
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    approx = {r["vec_id"] for r in ivfpq_topk(emb, q, k=10).collect()}
    # ANN with nprobe=2/8 cells + 4x refine: expect solid overlap on
    # this small corpus (the probed cells hold most near neighbors)
    assert len(exact & approx) >= 5
    assert len(approx) == 10


def test_deterministic(spark):
    emb, q = _query(spark)
    a = ivfpq_topk(emb, q, k=10).collect()
    b = ivfpq_topk(emb, q, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_rerank_sims_are_exact(spark):
    """The returned cosine_sim must be the TRUE cosine (re-ranked), not
    the ADC approximation: every returned (id, sim) appears identically
    in the exact all-scores frame."""
    emb, q = _query(spark)
    from scalecast_spark.datapipe.similarity import cosine_similarity_col

    vec = F.col("embedding").cast("array<double>")
    truth = {
        r["vec_id"]: r["cs"]
        for r in emb.select(
            "vec_id", F.round(cosine_similarity_col(vec, q), 6).alias("cs")
        ).collect()
    }
    for r in ivfpq_topk(emb, q, k=10).collect():
        assert truth[r["vec_id"]] == r["cosine_sim"]


def test_wider_refine_converges_to_ivf_answer(spark):
    """With refine covering the whole probed set, IVF-PQ == plain IVF
    (same cells, exact re-rank over everything the cells hold)."""
    from scalecast_spark.datapipe.similarity import ivf_topk

    emb, q = _query(spark)
    ivf = [tuple(r) for r in ivf_topk(emb, q, k=10, n_cells=8, nprobe=2).collect()]
    pq = [
        tuple(r)
        for r in ivfpq_topk(
            emb, q, k=10, n_cells=8, nprobe=2, refine=1000
        ).collect()
    ]
    assert ivf == pq
