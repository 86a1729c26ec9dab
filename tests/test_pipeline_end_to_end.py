"""The WHOLE training-data pipeline as one composition, crawl to
training sequences — every stage is unit/oracle-tested on its own;
this asserts the stages actually CHAIN (schemas line up, keep-lists
semi-join, determinism survives composition):

    documents -> exact dedup -> MinHash/LSH near-dedup (transitive
    clusters, quality-elected survivor) -> curation gates + PII scrub
    -> hashed embeddings -> SemDeDup -> per-source cap + token budget
    -> chunk -> pack -> BPE tokenize

Mirrors the published pre-training recipes (C4, Gopher, Lee et al.
dedup, SemDeDup) end-to-end on the sf0.001 fixture corpus.
"""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.cluster import kmeans_embeddings, semantic_dedup
from scalecast_spark.datapipe.dedup import (
    dedup_exact,
    duplicate_clusters,
    jaccard_pairs,
    keep_best_per_cluster,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from scalecast_spark.datapipe.embed import embed_docs
from scalecast_spark.datapipe.sample import (
    cap_per_group,
    pack_sequences,
    sample_to_token_budget,
)
from scalecast_spark.datapipe.text import chunk_documents, curate_corpus
from scalecast_spark.datapipe.tokenizer import bpe_tokenize, train_bpe
from scalecast_spark.sources import load_table


def _run_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup (lowest id per normalized content hash)
    stage1 = dedup_exact(docs)
    n1 = stage1.count()

    # 2. near-dedup: shingles -> minhash -> LSH candidates (capped) ->
    #    jaccard verify -> transitive clusters -> quality survivor
    sh = word_shingles(stage1, n=3)
    sigs = minhash_signatures(sh, n_hashes=16)
    cands = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=64)
    pairs = jaccard_pairs(sh, candidates=cands, min_jaccard=0.7)
    clusters = duplicate_clusters(pairs.select("id_a", "id_b"))
    scores = stage1.select(
        "doc_id", F.length("text").alias("len_score")
    )
    elected = keep_best_per_cluster(clusters, scores, "len_score")
    dropped_near = elected.filter(~F.col("keep")).select(
        F.col("doc_id")
    )
    stage2 = stage1.join(dropped_near, "doc_id", "left_anti")
    n2 = stage2.count()

    # 3. curation: quality + repetition gates, PII scrub (benchmark
    #    decontamination is exercised in test_span_decontam)
    curated = curate_corpus(stage2, min_tokens=3, min_quality=0.0)
    stage3 = curated.filter(F.col("keep")).select(
        "doc_id", F.col("text_scrubbed").alias("text"),
        "source", "n_chars",
    )
    n3 = stage3.count()

    # 4. semantic dedup over hashed embeddings (no embedding column in
    #    the corpus — the model-free bridge provides one)
    emb = embed_docs(stage3).filter(
        F.col("embedding").isNotNull()
    ).withColumnRenamed("doc_id", "vec_id")
    assigned = kmeans_embeddings(emb, k=4, n_iter=2)
    marked = semantic_dedup(emb, threshold=0.995, assigned=assigned)
    sem_keep = marked.filter(F.col("keep_sem")).select(
        F.col("vec_id").alias("doc_id")
    )
    stage4 = stage3.join(sem_keep, "doc_id", "left_semi")
    n4 = stage4.count()

    # 5. selection: no source dominates; then a global token budget
    capped = cap_per_group(stage4, "source", cap=200, key_col="doc_id")
    budget = sample_to_token_budget(
        capped, budget=30_000, weight_col="n_chars", key_col="doc_id"
    )
    n5 = budget.count()

    # 6. sequence construction: chunk -> pack -> BPE tokenize
    chunks = chunk_documents(
        budget.select("doc_id", "text"), max_tokens=64, overlap=8
    )
    packed = pack_sequences(
        chunks.select(
            F.concat_ws("_", "doc_id", "chunk_idx").alias("seq_id"),
            F.col("chunk_tokens").alias("w"),
        ),
        capacity=256, weight_col="w", key_col="seq_id",
    )
    merges = train_bpe(budget, vocab_size=300)
    tokens = bpe_tokenize(budget, merges)
    # determinism probe: every stage orders by md5/id, so re-executing
    # the final lazy DAG (a fresh count walks the whole lineage back to
    # the source parquet) must reproduce the selection exactly
    budget_ids = sorted(r["doc_id"] for r in budget.select("doc_id").collect())
    budget_ids2 = sorted(r["doc_id"] for r in budget.select("doc_id").collect())
    return {
        "counts": (n0, n1, n2, n3, n4, n5),
        "n_chunks": chunks.count(),
        "n_packed": packed.count(),
        "n_merges": len(merges),
        "n_tokenized": tokens.filter(F.size("bpe_tokens") > 0).count(),
        "ids_stable": budget_ids == budget_ids2,
    }


def test_full_pipeline_composes_and_shrinks_monotonically(spark, sf_dir):
    out = _run_pipeline(spark, sf_dir)
    n0, n1, n2, n3, n4, n5 = out["counts"]
    # every reduction stage can only shrink, and nothing collapses to 0
    assert n0 >= n1 >= n2 >= n3 >= n4 >= n5 > 0
    # the near-dup/semantic/budget stages must cut SOMETHING overall
    # (the sf0.001 fixture has near-dup clusters, not byte-exact dupes)
    assert n5 < n0
    assert out["n_chunks"] >= n5
    assert out["n_packed"] > 0
    assert out["n_merges"] > 0
    assert out["n_tokenized"] == n5
    assert out["ids_stable"]
