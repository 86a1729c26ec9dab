"""Incremental cross-corpus dedup + quality-based cluster keep rule."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.dedup import cross_dedup, keep_best_per_cluster

BASE = "the quick brown fox jumps over the lazy dog near the river bank"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cross_dedup_drops_only_cross_duplicates(spark):
    existing = _docs(spark, [(100, BASE), (101, "completely different content here about spark engines")])
    new = _docs(
        spark,
        [
            (1, BASE),  # exact dup of existing 100
            (2, BASE + " extra"),  # near dup of existing 100
            (3, "novel text with entirely fresh words and phrases today"),
            (4, "novel text with entirely fresh words and phrases today"),  # dup of 3 (WITHIN new)
        ],
    )
    kept = cross_dedup(new, existing, min_jaccard=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 not in ids and 2 not in ids  # cross dups dropped
    # within-new duplicates are NOT this operator's job
    assert ids == {3, 4}


def test_cross_dedup_id_overlap_is_fine(spark):
    # same ids on both sides must not confuse matching (content-only)
    existing = _docs(spark, [(1, BASE)])
    new = _docs(spark, [(1, "fresh unrelated words in this new document stream")])
    kept = cross_dedup(new, existing, min_jaccard=0.5)
    assert kept.count() == 1


def test_cross_dedup_empty_existing(spark):
    new = _docs(spark, [(1, BASE), (2, "other words")])
    existing = spark.createDataFrame([], "doc_id long, text string")
    assert cross_dedup(new, existing).count() == 2


def test_keep_best_per_cluster(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        ["doc_id", "cluster"],
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.1)],
        ["doc_id", "q"],
    )
    out = {r["doc_id"]: r["keep"] for r in keep_best_per_cluster(clusters, scores, "q").collect()}
    # cluster 1: 2 and 3 tie at 0.9 -> lower id wins
    assert out == {1: False, 2: True, 3: False, 10: True, 11: False}


def test_cross_dedup_validates_bands_and_reuses_sigs(spark):
    from scalecast_spark.datapipe.dedup import minhash_signatures, word_shingles

    existing = _docs(spark, [(100, BASE)])
    new = _docs(spark, [(1, BASE), (2, "fresh unrelated words entirely")])
    with pytest.raises(ValueError, match="bands"):
        cross_dedup(new, existing, n_hashes=2, bands=4)
    # precomputed existing-side signatures give identical results
    ex_sigs = minhash_signatures(word_shingles(existing, 3), n_hashes=4)
    a = {r["doc_id"] for r in cross_dedup(new, existing).collect()}
    b = {r["doc_id"] for r in cross_dedup(new, existing, existing_sigs=ex_sigs).collect()}
    assert a == b == {2}


def test_keep_best_handles_missing_scores_and_node_frame(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], ["node", "cluster"]  # duplicate_clusters shape
    )
    scores = spark.createDataFrame([(1, 0.2), (3, 0.5)], ["doc_id", "q"])
    rows = {r["doc_id"]: r for r in keep_best_per_cluster(clusters, scores, "q").collect()}
    # doc 2 has no score: present in output, never elected
    assert set(rows) == {1, 2, 3}
    assert rows[3]["keep"] and not rows[1]["keep"] and not rows[2]["keep"]
    assert rows[2]["q"] is None
