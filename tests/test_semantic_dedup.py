"""SemDeDup (datapipe/cluster.semantic_dedup): keep-rule semantics on
synthetic embeddings plus the documented chain behavior."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.cluster import semantic_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_near_duplicates_keep_earliest(spark):
    # one cluster (k=1): the cosine threshold alone separates groups —
    # orthogonal vectors never cross 0.95 regardless of cluster
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # dup of 1
        (3, [0.998, -0.01, 0.0, 0.0]),  # dup of 1 (and 2)
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.998, 0.02]),  # dup of 10
        (12, [0.0, 1.0, 0.0, 0.0]),     # orthogonal to everything
    ]
    out = semantic_dedup(_df(spark, rows), threshold=0.95, k=1, n_iter=1)
    keep = {r["vec_id"]: r["keep_sem"] for r in out.collect()}
    assert keep[1] is True
    assert keep[2] is False and keep[3] is False
    assert keep[10] is True and keep[11] is False
    assert keep[12] is True


def test_no_dups_all_kept(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    out = semantic_dedup(_df(spark, rows), threshold=0.95, k=2, n_iter=1)
    assert all(r["keep_sem"] for r in out.collect())


def test_chain_drops_dominated_even_if_anchor_dropped(spark):
    """Documented divergence from iterative peeling: b ~ a and c ~ b
    with c !~ a still drops BOTH b and c (dominated-by-any-earlier)."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # 18° apart pairwise: cos(18°)=0.951, cos(36°)=0.809
    rows = [(1, unit(0.0)), (2, unit(0.3142)), (3, unit(0.6283))]
    out = semantic_dedup(_df(spark, rows), threshold=0.95, k=1, n_iter=1)
    keep = {r["vec_id"]: r["keep_sem"] for r in out.collect()}
    assert keep == {1: True, 2: False, 3: False}


def test_reuses_existing_assignment(spark):
    from scalecast_spark.datapipe.cluster import kmeans_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = kmeans_embeddings(emb, k=4, n_iter=2)
    out = semantic_dedup(emb, threshold=0.4, assigned=assigned)
    assert set(out.columns) == {"vec_id", "cluster", "sqdist", "keep_sem"}
    assert out.count() == emb.count()
    # keep_sem only ever drops vectors that HAVE an earlier same-cluster
    # neighbor: vec 0 (smallest id) can never be dropped
    first = out.orderBy("vec_id").first()
    assert first["keep_sem"] is True


def test_gemm_expr_parity(spark):
    """The per-cluster GEMM kernel and the declarative self-join must
    agree exactly on the real corpus (6dp-rounded cosines)."""
    from scalecast_spark.datapipe.cluster import kmeans_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = kmeans_embeddings(emb, k=4, n_iter=2)
    g = semantic_dedup(emb, threshold=0.35, assigned=assigned, method="gemm")
    x = semantic_dedup(emb, threshold=0.35, assigned=assigned, method="expr")
    gk = {r["vec_id"]: r["keep_sem"] for r in g.collect()}
    xk = {r["vec_id"]: r["keep_sem"] for r in x.collect()}
    assert gk == xk
    assert not all(gk.values())  # threshold chosen so some drop
