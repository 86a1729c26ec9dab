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


def _clustered(spark, n_clusters=8, per=40, d=16, seed=3):
    """Tightly clustered corpus — the regime where residual PQ's
    codebook budget pays off (codes describe within-cell spread, not
    the coarse structure the IVF cells already capture)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d) * 5.0
    rows = []
    i = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.randn(d) * 0.3
            rows.append((i, [float(x) for x in v]))
            i += 1
    q = centers[0] + rng.randn(d) * 0.3
    return (
        spark.createDataFrame(rows, ["vec_id", "embedding"]),
        [float(x) for x in q],
    )


def _recall(got, truth):
    g = {r["vec_id"] for r in got}
    return len(g & truth) / len(truth)


def test_residual_pq_recall_geq_plain(spark):
    """FAISS-recipe residual coding must not lose recall to the
    non-residual variant on clustered data (it is the variant built
    FOR that regime); Lloyd-TRAINING the residual codebooks (the full
    recipe, round 6) must not lose recall to the sampled init and
    should make the clustered regime nearly exact."""
    emb, q = _clustered(spark)
    truth = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    kw = dict(k=10, n_cells=8, nprobe=2, m=4, ksub=16, refine=2)
    plain = ivfpq_topk(emb, q, residual=False, **kw).collect()
    res = ivfpq_topk(emb, q, residual=True, **kw).collect()
    trained = ivfpq_topk(emb, q, residual=True, train_iters=2, **kw).collect()
    r_plain, r_res = _recall(plain, truth), _recall(res, truth)
    r_trained = _recall(trained, truth)
    assert r_res >= r_plain
    assert r_trained >= r_res
    assert r_trained >= 0.8  # the clustered regime should be nearly exact


def test_residual_pq_exact_rerank_values(spark):
    """Residual ADC only shapes the candidate set; returned sims are
    the exact cosines."""
    from scalecast_spark.datapipe.similarity import cosine_similarity_col

    emb, q = _query(spark)
    vec = F.col("embedding").cast("array<double>")
    truth = {
        r["vec_id"]: r["cs"]
        for r in emb.select(
            "vec_id", F.round(cosine_similarity_col(vec, q), 6).alias("cs")
        ).collect()
    }
    out = ivfpq_topk(emb, q, k=10, residual=True).collect()
    assert len(out) == 10
    for r in out:
        assert truth[r["vec_id"]] == r["cosine_sim"]


def test_residual_codebooks_are_residuals(spark):
    """Sampled codewords must be (v - assigned centroid) slices, not
    raw vector slices. On a CLUSTERED corpus (the regime residuals are
    for) the residual norms are much smaller than the raw norms; on
    unclustered data they need not be — the original fixture only
    passed this check through the pre-offset zero-residual degeneracy."""
    import numpy as np

    from scalecast_spark.datapipe.similarity import (
        ivf_centroids,
        pq_codebooks_residual,
    )

    emb, _ = _clustered(spark)
    cents = ivf_centroids(emb, 8)
    plain = pq_codebooks(emb, m=4, ksub=16)
    res = pq_codebooks_residual(emb, cents, m=4, ksub=16)
    assert len(res) == 4 and all(len(b) == 16 for b in res)
    rawn = np.mean([np.linalg.norm(v) for b in plain for _, v in b])
    resn = np.mean([np.linalg.norm(v) for b in res for _, v in b])
    assert resn < rawn


def test_trained_codebooks_match_numpy_lloyd(spark):
    """One training iteration equals an independent numpy Lloyd step
    from the same md5-sample init (assignment ties -> lowest code,
    empty codes keep their previous codeword)."""
    import numpy as np

    from scalecast_spark.datapipe.similarity import pq_codebooks_trained

    emb = _emb(spark)
    V = np.array(
        sorted(
            ([r["vec_id"], [float(x) for x in r["embedding"]]] for r in emb.collect()),
            key=lambda t: t[0],
        ),
        dtype=object,
    )
    X = np.array([np.array(v) for _, v in V])
    books0 = pq_codebooks(emb, m=8, ksub=16)
    books1 = pq_codebooks_trained(emb, m=8, ksub=16, n_iter=1)
    sub = 8
    for s in range(8):
        B = np.array([cw for _, cw in books0[s]])
        sl = X[:, s * sub : (s + 1) * sub]
        d2 = ((sl[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        code = np.argmin(d2, axis=1)
        want = B.copy()
        for c in range(16):
            mask = code == c
            if mask.any():
                want[c] = sl[mask].mean(0)
        got = np.array([cw for _, cw in books1[s]])
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_trained_codebooks_reduce_quantization_error(spark):
    """Lloyd training must strictly reduce mean squared quantization
    error vs the sampled init, in both plain and residual space — the
    reason trained books exist (VERDICT r5 #3)."""
    import numpy as np

    from scalecast_spark.datapipe.similarity import (
        ivf_centroids,
        pq_codebooks_residual,
        pq_codebooks_trained,
    )

    emb, _ = _clustered(spark)
    X = np.array(
        [
            np.array([float(x) for x in r["embedding"]])
            for r in emb.orderBy("vec_id").collect()
        ]
    )

    def mse(books, M):
        sub = len(books[0][0][1])
        tot = 0.0
        for s, book in enumerate(books):
            B = np.array([cw for _, cw in book])
            sl = M[:, s * sub : (s + 1) * sub]
            tot += ((sl[:, None, :] - B[None, :, :]) ** 2).sum(-1).min(1).sum()
        return tot / len(M)

    plain0 = pq_codebooks(emb, m=4, ksub=8)
    plain2 = pq_codebooks_trained(emb, m=4, ksub=8, n_iter=2)
    assert mse(plain2, X) < mse(plain0, X)

    cents = ivf_centroids(emb, 8)
    C = np.array([cv for _, cv in cents])
    R = X - C[np.argmax(X @ C.T, axis=1)]
    res0 = pq_codebooks_residual(emb, cents, m=4, ksub=8)
    res2 = pq_codebooks_trained(emb, m=4, ksub=8, n_iter=2, cents=cents)
    assert mse(res2, R) < mse(res0, R)


def test_residual_sample_is_disjoint_from_centroids(spark):
    """The residual codeword sample starts past the centroid sample:
    the first n_cells md5-ordered vectors ARE the centroids, whose
    residuals are (near-)zero duplicates that waste codebook capacity
    and create argmin ties decided by float noise (round-6 bug). No
    init codeword may be the zero vector."""
    import numpy as np

    from scalecast_spark.datapipe.similarity import (
        ivf_centroids,
        pq_codebooks_residual,
    )

    emb = _emb(spark)
    cents = ivf_centroids(emb, 8)
    res = pq_codebooks_residual(emb, cents, m=8, ksub=16)
    for book in res:
        norms = [np.linalg.norm(cw) for _, cw in book]
        assert min(norms) > 1e-6
