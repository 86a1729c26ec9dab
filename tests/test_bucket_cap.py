"""LSH hot-bucket capping (round-5 scale hardening): a template family
of n near-identical docs shares every band hash, so one bucket would
emit n²/2 candidate pairs. With max_bucket_size the oversized bucket
collapses to a min-id star (n-1 pairs) while small buckets stay exact
pairwise; cross_dedup caps its existing side and its verify step is
candidate-driven (no wholesale re-shingle of the training corpus)."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.dedup import (
    cross_dedup,
    duplicate_clusters,
    lsh_candidate_pairs,
    minhash_signatures_projection,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank"


def _family_docs(spark, n, extra=()):
    rows = [(i, BASE + f" tag{i % 2}") for i in range(n)]  # near-identical
    rows += list(extra)
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_star_collapse_bounds_template_family(spark):
    n = 200
    docs = spark.createDataFrame(
        [(i, BASE) for i in range(n)], ["doc_id", "text"]
    )
    sigs = minhash_signatures_projection(docs, n=3, n_hashes=16)
    capped = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=10)
    rows = capped.collect()
    # a star from hub id 0: n-1 pairs, never n^2/2
    assert len(rows) == n - 1
    assert all(r["id_a"] == 0 for r in rows)
    assert {r["id_b"] for r in rows} == set(range(1, n))
    # the transitive closure still sees ONE family
    clusters = duplicate_clusters(capped)
    assert clusters.select("cluster").distinct().count() == 1
    assert clusters.count() == n


def test_cap_leaves_small_buckets_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE + " extra"),
            (3, "completely different words about spark engines today"),
        ],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures_projection(docs, n=3, n_hashes=16)
    plain = {tuple(r) for r in lsh_candidate_pairs(sigs, bands=4).collect()}
    capped = {
        tuple(r)
        for r in lsh_candidate_pairs(sigs, bands=4, max_bucket_size=50).collect()
    }
    assert plain == capped and (1, 2) in plain

    with pytest.raises(ValueError, match="max_bucket_size"):
        lsh_candidate_pairs(sigs, bands=4, max_bucket_size=1)


def test_cross_dedup_existing_cap_same_verdicts(spark):
    # a 50-member template family in the TRAINING corpus: every new doc
    # that collides must still be dropped with the cap on
    existing = _family_docs(
        spark, 50, extra=[(900, "unrelated training text entirely")]
    )
    new = spark.createDataFrame(
        [(1, BASE + " tag0"), (2, "novel fresh words with no overlap here")],
        ["doc_id", "text"],
    )
    plain = {r["doc_id"] for r in cross_dedup(new, existing).collect()}
    capped = {
        r["doc_id"]
        for r in cross_dedup(new, existing, max_bucket_size=5).collect()
    }
    assert plain == capped == {2}


def test_cross_dedup_verify_is_candidate_driven(spark):
    """Plan shape: both shingle-array sides sit behind a LeftSemi
    filter on candidate ids — the training corpus is never re-shingled
    wholesale during verify."""
    existing = _family_docs(spark, 3)
    new = spark.createDataFrame([(1, BASE + " tag0")], ["doc_id", "text"])
    out = cross_dedup(new, existing)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert plan.count("LeftSemi") >= 2


def test_hamming_star_collapse_bounds_identical_family(spark):
    """A family of n identical hashes shares every band chunk; with
    the cap each band emits a star, the union dedupes, and the exact
    bit_count verify keeps all hub pairs (hamming 0)."""
    from scalecast_spark.datapipe.dedup import hamming_near_pairs

    n = 100
    rows = [(i, 0b101010) for i in range(n)] + [(900, 0xFFFFFF)]
    df = spark.createDataFrame(rows, ["doc_id", "h"])
    capped = hamming_near_pairs(
        df, "h", bits=24, max_hamming=3, max_bucket_size=10
    ).collect()
    assert len(capped) == n - 1
    assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in capped)

    with pytest.raises(ValueError, match="max_bucket_size"):
        hamming_near_pairs(df, "h", bits=24, max_bucket_size=1)


def test_hamming_cap_leaves_small_buckets_exact(spark):
    from scalecast_spark.datapipe.dedup import hamming_near_pairs

    rows = [(1, 0b1111), (2, 0b1110), (3, 0b1000_0000_1111)]
    df = spark.createDataFrame(rows, ["doc_id", "h"])
    plain = {tuple(r) for r in hamming_near_pairs(df, "h", bits=16, max_hamming=2).collect()}
    capped = {
        tuple(r)
        for r in hamming_near_pairs(
            df, "h", bits=16, max_hamming=2, max_bucket_size=50
        ).collect()
    }
    assert plain == capped and (1, 2, 1) in plain


def test_hamming_star_false_collisions_filtered(spark):
    """Members of an oversized bucket beyond the radius from the hub
    are dropped by the exact verify, never mislabeled."""
    from scalecast_spark.datapipe.dedup import hamming_near_pairs

    # 20 identical hashes + one sharing only the low band but 10 bits
    # away overall — forced into the same oversized low-band bucket
    rows = [(i, 0b0000_0011) for i in range(20)]
    rows.append((500, 0b1111_1111_1100_0011))
    df = spark.createDataFrame(rows, ["doc_id", "h"])
    out = hamming_near_pairs(
        df, "h", bits=16, max_hamming=3, max_bucket_size=5
    ).collect()
    ids = {r["id_b"] for r in out} | {r["id_a"] for r in out}
    assert 500 not in ids
    assert len(out) == 19  # the star over the identical family


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_capped_pipeline_same_clusters_on_random_families(spark, seed):
    """End-to-end semantic equivalence: on corpora of exact-duplicate
    families (the workload the cap targets), the capped pipeline's
    transitive closure must equal the uncapped one's — star collapse
    changes the candidate GRAPH, never the components."""
    import random

    from scalecast_spark.datapipe.dedup import (
        duplicate_clusters,
        jaccard_pairs_arrays,
        lsh_candidate_pairs,
        minhash_signatures_projection,
        shingle_array,
    )
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    words = [f"w{j}" for j in range(40)]
    rows, nid = [], 0
    for fam in range(rng.randint(3, 6)):
        text = " ".join(rng.choices(words, k=rng.randint(8, 20)))
        for _ in range(rng.randint(1, 30)):
            rows.append((nid, text))
            nid += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = minhash_signatures_projection(docs, n=3, n_hashes=16)
    base = docs.select(
        "doc_id", shingle_array(F.col("text"), 3).alias("_sh_arr")
    )

    def clusters(cands):
        pairs = jaccard_pairs_arrays(base, cands, min_jaccard=0.5)
        if pairs.limit(1).count() == 0:
            return {}
        return {
            r["node"]: r["cluster"]
            for r in duplicate_clusters(pairs.select("id_a", "id_b")).collect()
        }

    plain = clusters(lsh_candidate_pairs(sigs, bands=4))
    capped = clusters(lsh_candidate_pairs(sigs, bands=4, max_bucket_size=5))
    assert plain == capped
