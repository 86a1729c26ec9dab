"""LSH headline wiring (VERDICT r1 'Next round' #2): the scale twins
now back the oracle queries; these tests pin the recall/containment
relationships between scale paths and their exact twins."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_lsh_jaccard_equals_exact(docs):
    """4 bands × 1 hash has recall 1.0 for the J≥0.5 pairs on the test
    corpora (every qualifying pair has J≥0.9; per-pair miss ≤ 1e-4 and
    the md5 hashes are deterministic, so this is a frozen fact of the
    data, not a flaky sample)."""
    from scalecast_spark.datapipe.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures_projection,
        word_shingles,
    )

    sh = word_shingles(docs, 3).cache()
    exact = _pairs(jaccard_pairs(sh, min_jaccard=0.5))
    sigs = minhash_signatures_projection(docs, 3, 4)
    cands = lsh_candidate_pairs(sigs, bands=4)
    lsh = _pairs(jaccard_pairs(sh, candidates=cands, min_jaccard=0.5))
    assert lsh <= exact, "LSH-restricted jaccard emitted a non-qualifying pair"
    assert lsh == exact, f"LSH missed pairs: {sorted(exact - lsh)[:5]}"


def test_lsh_candidates_subquadratic(docs):
    """Candidate count must stay far below N² — the point of banding."""
    from scalecast_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_projection,
    )

    n = docs.count()
    sigs = minhash_signatures_projection(docs, 3, 4)
    n_cand = lsh_candidate_pairs(sigs, bands=4).count()
    assert n_cand < n * (n - 1) // 8, f"{n_cand} candidates for {n} docs"


def test_blocked_gemm_equals_exact(emb):
    from scalecast_spark.datapipe.similarity import (
        blocked_pairwise_above,
        exact_pairwise_above,
    )

    sample = emb.filter(F.col("vec_id") < 200)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in exact_pairwise_above(sample, threshold=0.3).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in blocked_pairwise_above(sample, threshold=0.3, n_blocks=4).collect()
    }
    assert set(blocked) == set(exact)
    for k in exact:
        assert blocked[k] == pytest.approx(exact[k], abs=2e-6)


def test_lsh_near_dup_contained_in_exact(emb):
    """ANN path: recall < 1 by design at cosine 0.3 (random-hyperplane
    LSH cannot bucket 72° apart vectors together reliably) — but every
    emitted pair must be a true qualifying pair (precision 1.0, since
    candidates are exactly re-scored)."""
    from scalecast_spark.datapipe.similarity import (
        exact_pairwise_above,
        pairwise_cosine_above,
    )

    sample = emb.filter(F.col("vec_id") < 300)
    exact = _pairs(exact_pairwise_above(sample, threshold=0.3))
    lsh = _pairs(pairwise_cosine_above(sample, threshold=0.3, n_planes=6))
    assert lsh <= exact
    assert lsh, "LSH bucket join found no pairs at all — wiring broken"
