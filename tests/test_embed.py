"""Hashing-trick document embeddings (datapipe/embed.embed_docs):
determinism, geometry, degenerate inputs, and the end-to-end bridge
into the embedding-space pipelines."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.embed import embed_docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_embed_shape_norm_and_determinism(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow"),
    ]
    a = {r["doc_id"]: r["embedding"] for r in embed_docs(_docs(spark, rows)).collect()}
    b = {r["doc_id"]: r["embedding"] for r in embed_docs(_docs(spark, rows)).collect()}
    for i in rows:
        v = np.array(a[i[0]])
        assert len(v) == 64
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12
        assert a[i[0]] == b[i[0]]  # bit-identical across invocations


def test_embed_duplicate_texts_are_identical_vectors(spark):
    rows = [
        (1, "same exact words here"),
        (2, "same exact words here"),
        (3, "totally different content xyzzy"),
    ]
    e = {r["doc_id"]: np.array(r["embedding"])
         for r in embed_docs(_docs(spark, rows)).collect()}
    assert np.array_equal(e[1], e[2])
    cos_dup = float(e[1] @ e[2])
    cos_mix = float(e[1] @ e[3])
    assert abs(cos_dup - 1.0) < 1e-12
    assert cos_mix < cos_dup


def test_embed_token_overlap_orders_cosine(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta IOTA"
    far = "one two three four five six seven eight"
    e = {r["doc_id"]: np.array(r["embedding"])
         for r in embed_docs(_docs(spark, [(1, base), (2, near), (3, far)])).collect()}
    assert float(e[1] @ e[2]) > float(e[1] @ e[3])


def test_embed_empty_and_whitespace_docs_are_null(spark):
    rows = [(1, ""), (2, "   \n\t "), (3, "ok")]
    out = {r["doc_id"]: r["embedding"]
           for r in embed_docs(_docs(spark, rows)).collect()}
    assert out[1] is None
    assert out[2] is None
    assert out[3] is not None


def test_embed_multiplicity_counts(spark):
    # bag-of-words: repeating a token must change the vector (unlike
    # SimHash's distinct-word signature)
    e = {r["doc_id"]: np.array(r["embedding"])
         for r in embed_docs(_docs(spark, [(1, "word other"),
                                           (2, "word word word other")])).collect()}
    assert not np.array_equal(e[1], e[2])


def test_embed_dim_validation(spark):
    with pytest.raises(ValueError, match="dim"):
        embed_docs(_docs(spark, [(1, "x")]), dim=1)


def test_embed_bridges_into_semantic_dedup(spark):
    """End-to-end: raw text -> hashed embeddings -> k-means +
    SemDeDup, no precomputed embedding column anywhere."""
    from scalecast_spark.datapipe.cluster import (
        kmeans_embeddings,
        semantic_dedup,
    )

    rows = [(i, f"document number {i} about topic {i % 3} "
                f"with shared filler words") for i in range(30)]
    rows += [(100, rows[0][1])]  # exact duplicate of doc 0
    emb = embed_docs(_docs(spark, rows)).filter(
        F.col("embedding").isNotNull()
    ).withColumnRenamed("doc_id", "vec_id")
    assigned = kmeans_embeddings(emb, k=3, n_iter=2)
    marked = semantic_dedup(emb, threshold=0.999, assigned=assigned)
    dup = {r["vec_id"]: r["keep_sem"] for r in marked.collect()}
    # the exact duplicate (higher id) must be dropped, its original kept
    assert dup[0] is True or dup[0] == 1
    assert dup[100] is False or dup[100] == 0


def test_embed_rowwise_bit_identical_to_batch(spark):
    """The row-local fold and the explode+groupBy path feed the same
    exact integer counts into the same normalization arithmetic, so the
    vectors must be BIT-identical."""
    from scalecast_spark.datapipe.embed import embed_docs_rowwise

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "word word word other"),
        (3, ""),
        (4, "  \n\t "),
        (5, "Mixed CASE   and\nnewlines\tand repeats repeats"),
    ]
    df = _docs(spark, rows)
    batch = {r["doc_id"]: r["embedding"] for r in embed_docs(df).collect()}
    roww = {r["doc_id"]: r["embedding"]
            for r in embed_docs_rowwise(df).collect()}
    assert set(batch) == set(roww)
    for k in batch:
        assert batch[k] == roww[k], k  # exact, not approx


def test_embed_rowwise_stream_parity(spark, sf_dir):
    """embed_docs_rowwise is a stateless projection, so it applies to a
    readStream firehose unchanged (append mode) and reproduces the
    batch embed_docs vectors exactly."""
    import tempfile

    from scalecast_spark.datapipe.embed import embed_docs_rowwise
    from scalecast_spark.sources import load_table
    from scalecast_spark.streaming import run_available_now, stream_documents

    docs = load_table(spark, sf_dir, "documents")
    want = embed_docs(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    stream = stream_documents(spark, f"{sf_dir}/documents.parquet")
    s = embed_docs_rowwise(stream)
    assert s.isStreaming
    with tempfile.TemporaryDirectory() as ck:
        got = run_available_now(s, "q_embed_stream", ck, output_mode="append")
        gp = got.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(gp) == len(want) > 0
    assert list(gp["doc_id"]) == list(want["doc_id"])
    for a, b in zip(gp["embedding"], want["embedding"]):
        assert (a is None) == (b is None)
        if a is not None:
            assert list(a) == list(b)


def test_embed_rowwise_parity_fuzz(spark):
    """Hypothesis sweep over adversarial text (unicode, regex-special
    chars, mixed whitespace): the two independent expression
    implementations (F.* builders vs hand-written SQL strings) must
    stay bit-identical."""
    from hypothesis import given, settings, strategies as st

    from scalecast_spark.datapipe.embed import embed_docs_rowwise

    texts = st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x2FFF
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=15, deadline=None)
    @given(texts)
    def check(docs):
        rows = [(i, t) for i, t in enumerate(docs)]
        df = _docs(spark, rows)
        a = {r["doc_id"]: r["embedding"] for r in embed_docs(df).collect()}
        b = {r["doc_id"]: r["embedding"]
             for r in embed_docs_rowwise(df).collect()}
        assert a == b

    check()


def test_embed_bridges_into_ivfpq_ann(spark):
    """End-to-end: raw text -> hashed embeddings -> IVF-PQ ANN; the
    exact duplicate of the query doc must surface at rank 1 with
    cosine ~1."""
    from scalecast_spark.datapipe.similarity import ivfpq_topk

    rows = [(i, f"doc {i} talks about subject {i % 5} in passing")
            for i in range(40)]
    rows.append((99, rows[7][1]))  # duplicate of doc 7
    emb = embed_docs(_docs(spark, rows)).filter(
        F.col("embedding").isNotNull()
    ).withColumnRenamed("doc_id", "vec_id")
    q = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    top = ivfpq_topk(emb.filter(F.col("vec_id") != 7), list(q), k=3,
                     n_cells=4, m=8, nprobe=4)
    best = top.orderBy(F.desc("cosine_sim")).collect()[0]
    assert best["vec_id"] == 99
    assert best["cosine_sim"] > 0.999


def test_embed_sparse_bit_identical_to_dense(spark):
    """The sparse (id, component) pre-aggregation path sums the same
    integers as the dense dim-wide conditional-sum path, so the
    normalized vectors are BIT-identical — including the NULL embedding
    for tokenless documents."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog the the"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "   "),  # tokenless -> NULL on both paths
        (4, "sphinx of black quartz judge my vow sphinx"),
    ]
    dense = {
        r["doc_id"]: r["embedding"]
        for r in embed_docs(_docs(spark, rows), dim=64, method="dense").collect()
    }
    sparse = {
        r["doc_id"]: r["embedding"]
        for r in embed_docs(_docs(spark, rows), dim=64, method="sparse").collect()
    }
    assert dense.keys() == sparse.keys()
    assert dense[3] is None and sparse[3] is None
    for k in (1, 2, 4):
        assert dense[k] == sparse[k]  # exact float equality


def test_embed_auto_picks_sparse_above_cap(spark):
    """auto routes dim>128 to the sparse plan: the dense plan fails to
    even PARSE at dim=1024 (expression complexity), so this is the only
    viable wide-dim path — verify it builds, normalizes, and matches
    the rowwise streaming twin bit-for-bit at dim=512."""
    from scalecast_spark.datapipe.embed import embed_docs_rowwise

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, ""),
    ]
    for dim in (512, 1024):
        out = {
            r["doc_id"]: r["embedding"]
            for r in embed_docs(_docs(spark, rows), dim=dim).collect()
        }
        assert out[3] is None
        v = np.array(out[1])
        assert len(v) == dim
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    batch = {
        r["doc_id"]: r["embedding"]
        for r in embed_docs(_docs(spark, rows), dim=512).collect()
    }
    roww = {
        r["doc_id"]: r["embedding"]
        for r in embed_docs_rowwise(_docs(spark, rows), dim=512).collect()
    }
    assert batch == roww


def test_embed_method_validation(spark):
    with pytest.raises(ValueError, match="unknown method"):
        embed_docs(_docs(spark, [(1, "a b")]), method="magic")
