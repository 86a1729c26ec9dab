"""Datapipe operator tests: numeric parity vs local numpy/hashlib
implementations on the real synthetic documents/embeddings tables."""

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark.sources import load_table
from scalecast_spark.datapipe import dedup, similarity, text, multimodal


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_token_count_matches_python(docs):
    out = text.add_token_count(docs).orderBy("doc_id").limit(20).collect()
    raw = docs.orderBy("doc_id").limit(20).collect()
    for got, r in zip(out, raw):
        assert got["n_tokens"] == len(r["text"].split())


def test_fingerprint_is_md5(docs):
    out = text.add_fingerprint(docs).orderBy("doc_id").limit(5).collect()
    raw = docs.orderBy("doc_id").limit(5).collect()
    for got, r in zip(out, raw):
        norm = re.sub(r"\s+", " ", r["text"].strip().lower())
        assert got["fingerprint"] == hashlib.md5(norm.encode()).hexdigest()


def test_dedup_exact_removes_planted_dupe(spark, docs):
    extra = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
    with_dupe = docs.unionByName(extra)
    n = docs.count()
    kept = dedup.dedup_exact(with_dupe)
    assert kept.count() == n
    # the kept copy is the lower id
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_jaccard_estimates_real_jaccard(spark, docs):
    sh = dedup.word_shingles(docs.limit(50), 3)
    pairs = dedup.jaccard_pairs(sh).collect()
    sh_pdf = sh.toPandas()
    sets = sh_pdf.groupby("doc_id")["shingle"].apply(set).to_dict()
    for p in pairs[:10]:
        a, b = sets[p["id_a"]], sets[p["id_b"]]
        expected = len(a & b) / len(a | b)
        assert p["jaccard"] == pytest.approx(expected, abs=1e-6)


def test_lsh_candidates_subset_verified_by_jaccard(docs):
    sh = dedup.word_shingles(docs, 3)
    sig = dedup.minhash_signatures(sh, 16)
    cand = dedup.lsh_candidate_pairs(sig, bands=4)
    verified = dedup.jaccard_pairs(sh, candidates=cand, min_jaccard=0.8)
    # every verified pair is a candidate pair (join semantics)
    assert verified.count() <= cand.count()


def test_simhash_identical_docs_same_hash(spark, docs):
    dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
    sim = dedup.simhash(docs.limit(1).unionByName(dup))
    vals = [r["simhash"] for r in sim.collect()]
    assert len(vals) == 2 and vals[0] == vals[1]


def test_cosine_topk_matches_numpy(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=float)
    q = mat[0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    exp_top = set(np.argsort(-sims)[:5])
    got = similarity.cosine_topk(emb, list(q), k=5).collect()
    got_ids = {r["vec_id"] for r in got}
    assert got_ids == {int(pdf["vec_id"].iloc[i]) for i in exp_top}
    # and values match to rounding
    for r in got:
        i = pdf.index[pdf["vec_id"] == r["vec_id"]][0]
        assert r["cosine_sim"] == pytest.approx(sims[i], abs=1e-5)


def test_lsh_topk_recall(emb):
    q = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, list(q), k=5).collect()}
    approx = {r["vec_id"] for r in similarity.lsh_bucket_topk(emb, list(q), k=5, n_planes=4).collect()}
    # ANN must at least find the query itself and overlap the exact set
    assert 0 in approx
    assert len(exact & approx) >= 1


def test_multimodal_plumbing(docs):
    pay = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    meta = multimodal.attach_binary_metadata(pay)
    row = meta.orderBy("doc_id").limit(1).collect()[0]
    assert row["payload_bytes"] > 0 and len(row["content_id"]) == 32
    feats = multimodal.extract_image_features(pay.limit(4)).collect()
    assert all(len(r["feat"]) == 6 for r in feats)
    # deterministic fake decode → repeatable features
    feats2 = multimodal.extract_image_features(pay.limit(4)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_real_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_bytes(b"xx")


def test_ivf_topk_deterministic_and_subset(emb):
    q = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    a = similarity.ivf_topk(emb, q, k=5, n_cells=4, nprobe=2).collect()
    b = similarity.ivf_topk(emb, q, k=5, n_cells=4, nprobe=2).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]  # deterministic
    assert 0 in {r["vec_id"] for r in a}  # probes its own cell
    # every IVF score equals the exact cosine for that id
    exact = {
        r["vec_id"]: r["cosine_sim"]
        for r in similarity.cosine_topk(emb, q, k=1000).collect()
    }
    for r in a:
        assert r["cosine_sim"] == pytest.approx(exact[r["vec_id"]], abs=1e-6)
    # probing ALL cells recovers the exact top-k
    full = similarity.ivf_topk(emb, q, k=5, n_cells=4, nprobe=4).collect()
    exact5 = similarity.cosine_topk(emb, q, k=5).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in exact5]


def test_kmeans_embeddings_partitions_corpus(spark, sf_dir):
    """Lloyd k-means: every vector assigned, clusters non-trivial, and
    each vector's sqdist is genuinely the min over final centroids."""
    from scalecast_spark.datapipe.cluster import kmeans_embeddings
    from scalecast_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_embeddings(emb, k=4, n_iter=2).toPandas()
    assert len(out) == emb.count()
    assert out["cluster"].between(1, 4).all()
    assert out["cluster"].nunique() >= 2  # corpus actually partitions
    assert (out["sqdist"] >= 0).all()


def test_deterministic_sample_reproducible(spark, sf_dir):
    from scalecast_spark.datapipe.sample import deterministic_sample
    from scalecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    assert a == b  # pure function of the data
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # near the nominal rate
    # larger rate strictly contains the smaller one (nested samples)
    c = {r["doc_id"] for r in deterministic_sample(docs, 0.6, "doc_id").select("doc_id").collect()}
    assert a <= c


def test_tfidf_prefers_rare_terms(spark):
    from scalecast_spark.datapipe.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "common zebra"), (2, "common yak"), (3, "common emu")],
        schema="doc_id long, text string",
    )
    out = tfidf_top_terms(docs, top_k=1).toPandas().set_index("doc_id")
    # equal tf: the doc-unique term out-scores the ubiquitous one
    assert out.loc[1, "term"] == "zebra"
    assert out.loc[2, "term"] == "yak"
    assert out.loc[3, "term"] == "emu"


def test_vectorized_assignment_matches_expression_path(spark, sf_dir):
    """The GEMM assignment twin must agree with the expression-based
    argmin (same clusters; sqdist equal to 6dp)."""
    from scalecast_spark.datapipe.cluster import (
        assign_clusters_vectorized,
        kmeans_embeddings,
    )
    from scalecast_spark.datapipe.similarity import ivf_centroids
    from scalecast_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, 4)
    a = (
        kmeans_embeddings(emb, k=4, n_iter=0)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        assign_clusters_vectorized(emb, cents)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (a["cluster"].values == b["cluster"].values).all()
    assert (abs(a["sqdist"].values - b["sqdist"].values) < 2e-6).all()


def test_repetition_signals_python_parity(spark):
    rows = [
        (0, "a b\na b\nc d"),            # 3 lines, one dup pair
        (1, "x y x y x y"),              # top bigram "x y" 3 of 5
        (2, "single"),                    # no bigrams, no dup lines
        (3, ""),                          # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.add_repetition_signals(df).collect()}
    assert got[0]["dup_line_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert got[1]["dup_line_frac"] == 0.0
    # bigrams of doc1: xy yx xy yx xy -> top "x y" = 3/5
    assert got[1]["top2gram_frac"] == pytest.approx(0.6, abs=1e-6)
    assert got[2]["top2gram_frac"] == 0.0
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["top2gram_frac"] == 0.0


def test_contamination_hits_counts_distinct_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains bench 8-grams starting at one & two -> 2 hits
            (0, "zero one two three four five six seven eight nine ten"),
            (1, "totally different words with no overlap at all here ok"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_contam"]
           for r in text.contamination_hits(docs, bench, n=8).collect()}
    assert got == {0: 2}


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "mail me at a.b+c@example.com or call +1 555-123-4567 now")],
        "doc_id long, text string",
    )
    r = text.scrub_pii(df).collect()[0]
    assert r["n_emails"] == 1 and r["n_phones"] == 1
    assert "<EMAIL>" in r["text_scrubbed"] and "<PHONE>" in r["text_scrubbed"]
    assert "example.com" not in r["text_scrubbed"]
    assert "555" not in r["text_scrubbed"]


def test_duplicate_clusters_transitive(spark):
    # chain 1-2-3 (one cluster via transitivity), pair 10-11, pair 20-21
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11), (21, 20)], "id_a long, id_b long"
    )
    out = {r["node"]: r["cluster"]
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_duplicate_clusters_long_chain_converges(spark):
    # a 12-node path stresses multi-round propagation + checkpointing
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    out = dedup.duplicate_clusters(pairs, max_iter=20, checkpoint_every=3)
    rows = out.collect()
    assert all(r["cluster"] == 0 for r in rows) and len(rows) == 13


def test_dedup_exact_ids_only_matches_full(docs):
    full = {r["doc_id"] for r in dedup.dedup_exact(docs).select("doc_id").collect()}
    ids = {r["doc_id"] for r in dedup.dedup_exact(docs, ids_only=True).collect()}
    assert ids == full and len(ids) > 0


def test_audio_features_real_wav(spark):
    """The audio path is REAL (stdlib wave + numpy PCM16): a 440 Hz
    synthesized tone comes back with exact sample rate, duration, the
    analytic RMS of a sine (1/sqrt(2) of amplitude), and ~2*f0/sr ZCR."""
    import io
    import wave

    import numpy as _np

    sr, secs, f0, amp = 16000, 0.5, 440.0, 0.5
    t = _np.arange(int(sr * secs)) / sr
    pcm = (amp * _np.sin(2 * _np.pi * f0 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    rows = [(0, bytearray(buf.getvalue())), (1, bytearray(b"not a wav"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in multimodal.extract_audio_features(df).collect()}
    ok = got[0]
    assert ok["sample_rate"] == sr and ok["n_channels"] == 1
    assert ok["duration_sec"] == pytest.approx(secs, abs=1e-6)
    assert ok["rms"] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert ok["zero_cross_rate"] == pytest.approx(2 * f0 / sr, rel=0.02)
    assert got[1]["sample_rate"] is None  # corrupt payload -> NULLs


def test_thumbnails_deterministic_shape(spark):
    df = spark.createDataFrame(
        [(i, bytearray(f"img{i}".encode())) for i in range(4)],
        "doc_id long, payload binary",
    )
    out = multimodal.make_thumbnails(df, h=4, w=5).collect()
    assert len(out) == 4
    for r in out:
        assert len(bytes(r["thumb"])) == 4 * 5 * 3
    # deterministic: same payload -> same thumbnail bytes
    again = {r["doc_id"]: bytes(r["thumb"])
             for r in multimodal.make_thumbnails(df, h=4, w=5).collect()}
    for r in out:
        assert bytes(r["thumb"]) == again[r["doc_id"]]


def test_multimodal_null_payloads_survive(spark):
    """NULL payloads must yield NULL-feature rows, not kill the task
    (mapInPandas hands pandas None for a NULL binary cell)."""
    df = spark.createDataFrame(
        [(0, bytearray(b"img0")), (1, None)], "doc_id long, payload binary"
    )
    audio = {r["doc_id"]: r for r in multimodal.extract_audio_features(df).collect()}
    assert audio[1]["sample_rate"] is None and audio[1]["rms"] is None
    thumbs = {r["doc_id"]: r for r in multimodal.make_thumbnails(df, h=4, w=5).collect()}
    assert thumbs[1]["thumb"] is None and thumbs[1]["thumb_c"] is None
    assert len(bytes(thumbs[0]["thumb"])) == 4 * 5 * 3  # good row intact
    assert thumbs[0]["thumb_c"] == 3


def test_resize_nearest_identity_and_downscale():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    assert (multimodal.resize_nearest(img, 6, 4) == img).all()
    small = multimodal.resize_nearest(img, 3, 2)
    assert small.shape == (3, 2, 3)
    assert (small == img[[0, 2, 4]][:, [0, 2]]).all()


def test_kmeans_vectorized_full_loop_parity(spark, sf_dir):
    """kmeans_embeddings(vectorized=True) — GEMM assignment AND GEMM
    partial-sum mean updates — lands the same clusters as the
    expression path after real Lloyd iterations."""
    from scalecast_spark.datapipe.cluster import kmeans_embeddings
    from scalecast_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    expr = (
        kmeans_embeddings(emb, k=4, n_iter=2, vectorized=False)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    gemm = (
        kmeans_embeddings(emb, k=4, n_iter=2, vectorized=True)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (expr["cluster"].values == gemm["cluster"].values).all()
    assert (abs(expr["sqdist"].values - gemm["sqdist"].values) < 2e-6).all()
    # auto mode: k*d = 256 is under the default threshold -> expression
    auto = (
        kmeans_embeddings(emb, k=4, n_iter=2)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (auto["sqdist"].values == expr["sqdist"].values).all()


def test_default_decode_env_switch(monkeypatch):
    import importlib.util

    from scalecast_spark.datapipe import multimodal as mm

    monkeypatch.setenv("SCALECAST_SPARK_IMAGE_DECODE", "fake")
    assert mm.default_decode() is mm.fake_decode
    monkeypatch.setenv("SCALECAST_SPARK_IMAGE_DECODE", "pil")
    assert mm.default_decode() is mm.pil_decode
    monkeypatch.setenv("SCALECAST_SPARK_IMAGE_DECODE", "bogus")
    with pytest.raises(ValueError, match="auto|pil|fake"):
        mm.default_decode()
    monkeypatch.delenv("SCALECAST_SPARK_IMAGE_DECODE")
    expected = mm.pil_decode if importlib.util.find_spec("PIL") else mm.fake_decode
    assert mm.default_decode() is expected


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="Pillow not installed in this container",
)
def test_pil_decode_real_codec(spark):
    """Pillow-present CI leg: a real PNG round-trips through
    extract_image_features under decode=pil_decode."""
    import io

    from PIL import Image

    from scalecast_spark.datapipe.multimodal import extract_image_features, pil_decode

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), (10, 20, 30)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, payload binary")
    out = extract_image_features(df, decode=pil_decode).collect()
    assert out[0]["feat"][:3] == [10.0, 20.0, 30.0]


def test_cap_per_group_caps_and_is_deterministic(spark, sf_dir):
    from scalecast_spark.datapipe.sample import cap_per_group
    from scalecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = cap_per_group(docs, "source", 10, "doc_id").select("doc_id", "source")
    pdf = out.toPandas()
    assert (pdf.groupby("source").size() <= 10).all()
    # groups smaller than the cap survive whole
    sizes = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    got = pdf.groupby("source").size()
    for src, n in sizes.items():
        assert got.get(src, 0) == min(n, 10)
    # pure function of the data
    again = cap_per_group(docs, "source", 10, "doc_id").select("doc_id").toPandas()
    assert set(pdf["doc_id"]) == set(again["doc_id"])


def test_sample_to_token_budget_matches_global_prefix(spark, sf_dir):
    """The bucketed two-phase plan must equal the single global
    cumulative-sum definition, replayed here in pandas."""
    import hashlib

    from scalecast_spark.datapipe.sample import sample_to_token_budget
    from scalecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    budget = 20000.0
    got = sample_to_token_budget(docs, budget, "n_chars", "doc_id")
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}

    pdf = docs.toPandas()
    pdf["h"] = [
        hashlib.md5(f"{i}:budget".encode()).hexdigest() for i in pdf["doc_id"]
    ]
    pdf["b"] = [int(h[:2], 16) % 256 for h in pdf["h"]]
    pdf = pdf.sort_values(["b", "h", "doc_id"])
    pdf["cum"] = pdf["n_chars"].cumsum()
    want = set(pdf[pdf["cum"] <= budget]["doc_id"])
    assert ids == want
    assert sum(pdf.set_index("doc_id").loc[list(ids), "n_chars"]) <= budget
    # budget larger than the corpus -> everything survives
    total = float(pdf["n_chars"].sum())
    assert sample_to_token_budget(docs, total + 1, "n_chars", "doc_id").count() == len(pdf)


def test_balance_by_cluster_caps_every_cluster(spark, sf_dir):
    from scalecast_spark.datapipe.cluster import balance_by_cluster
    from scalecast_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = balance_by_cluster(emb, k=4, per_cluster=20, n_iter=2).toPandas()
    assert (out.groupby("cluster").size() <= 20).all()
    assert out["doc_id" if "doc_id" in out else "vec_id"].is_unique


def test_pack_sequences_matches_greedy_replay(spark, sf_dir):
    """Distributed packing must equal the sequential greedy definition
    (md5-bucket order, close bin on overflow), replayed in pandas."""
    import hashlib

    from scalecast_spark.datapipe.sample import pack_sequences
    from scalecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cap = 2048.0
    got = pack_sequences(docs, cap, "n_chars", "doc_id").toPandas()

    pdf = docs.toPandas()
    pdf["h"] = [hashlib.md5(f"{i}:pack".encode()).hexdigest() for i in pdf["doc_id"]]
    pdf["b"] = [int(h[:2], 16) % 256 for h in pdf["h"]]
    want = {}
    for b, grp in pdf.groupby("b"):
        grp = grp.sort_values(["h", "doc_id"])
        fill, cur, first = 0.0, 0, True
        for doc, w in zip(grp["doc_id"], grp["n_chars"]):
            if first:
                fill, first = w, False
            elif fill + w <= cap:
                fill += w
            else:
                cur += 1
                fill = w
            want[doc] = (b, cur)
    assert len(got) == len(pdf)
    for r in got.itertuples():
        assert want[r.doc_id] == (r.bucket, r.bin)
    # no bin overflows unless it is a single oversized doc
    j = got.merge(pdf[["doc_id", "n_chars"]], on="doc_id")
    sizes = j.groupby(["bucket", "bin"]).agg(w=("n_chars", "sum"), n=("doc_id", "count"))
    assert ((sizes["w"] <= cap) | (sizes["n"] == 1)).all()


def test_kmeans_exploded_mean_update_bit_identical(spark, sf_dir):
    """The exploded-mean vectorized loop (the wired q_emb_kmeans path)
    must be BIT-identical to the expression path — exact-fold
    distances + the same groupBy-avg aggregation plan."""
    from scalecast_spark.datapipe.cluster import kmeans_embeddings
    from scalecast_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = (
        kmeans_embeddings(emb, k=4, n_iter=2, vectorized=False)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        kmeans_embeddings(emb, k=4, n_iter=2, vectorized=True, mean_update="exploded")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (a["cluster"].values == b["cluster"].values).all()
    assert (a["sqdist"].values == b["sqdist"].values).all()  # bitwise
    with pytest.raises(ValueError, match="partial|exploded"):
        kmeans_embeddings(emb, k=4, mean_update="bogus")


def test_pack_sequences_oversized_and_small(spark):
    from scalecast_spark.datapipe.sample import pack_sequences

    rows = [(i, w) for i, w in enumerate([5000.0, 10.0, 10.0, 3000.0, 1.0])]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = pack_sequences(df, 100.0, "w", "doc_id").toPandas()
    assert len(out) == 5
    j = out.merge(
        spark.createDataFrame(rows, "doc_id long, w double").toPandas(), on="doc_id"
    )
    sizes = j.groupby(["bucket", "bin"]).agg(w=("w", "sum"), n=("doc_id", "count"))
    # oversized docs sit alone in their bin; no multi-doc bin overflows
    assert ((sizes["w"] <= 100.0) | (sizes["n"] == 1)).all()
    # empty input packs to empty output, not an error
    assert pack_sequences(df.filter("doc_id < 0"), 100.0, "w", "doc_id").count() == 0


def test_token_budget_zero_and_tiny(spark):
    from scalecast_spark.datapipe.sample import sample_to_token_budget

    df = spark.createDataFrame(
        [(i, 10.0) for i in range(20)], "doc_id long, w double"
    )
    # budget below every row's weight -> empty sample (never negative)
    assert sample_to_token_budget(df, 5.0, "w", "doc_id").count() == 0
    # zero-weight rows are free: all survive any positive budget
    z = spark.createDataFrame([(i, 0.0) for i in range(5)], "doc_id long, w double")
    assert sample_to_token_budget(z, 1.0, "w", "doc_id").count() == 5


def test_repeated_spans_exact_substring_semantics(spark):
    from scalecast_spark.datapipe.text import add_duplication_signals, repeated_spans

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again today"),
        (1, "intro text then the quick brown fox jumps over the lazy dog again and ends"),
        (2, "completely unique content with no repetition whatsoever in this one here"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, k=5).collect()
    }
    # the shared 11-word sentence: doc0 words 0-10, doc1 words 3-13 —
    # overlapping 5-gram windows merged into ONE maximal span each
    assert spans == {(0, 0, 10), (1, 3, 13)}
    sig = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_span_words"])
        for r in add_duplication_signals(df, k=5).collect()
    }
    assert sig[0] == (1, 11) and sig[1] == (1, 11)
    assert sig[2] == (0, 0) and sig[3] == (0, 0)  # clean + empty docs
    # within-doc repetition counts too (min_count is corpus-wide)
    solo = spark.createDataFrame(
        [(9, "a b c d e x x a b c d e y")], "doc_id long, text string"
    )
    got = repeated_spans(solo, k=5).collect()
    assert {(r["span_start"], r["span_end"]) for r in got} == {(0, 4), (7, 11)}


def test_trigram_logprob_separates_prose_from_gibberish(spark):
    from scalecast_spark.datapipe.text import add_trigram_logprob

    rows = [
        (0, "the cat sat on the mat and the cat sat again"),
        (1, "the dog sat on the mat and the dog sat again"),
        (2, "zxqj vwkp qqzz xjvw pkqz"),
        (3, "ab"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["tri_logprob"] for r in add_trigram_logprob(df).collect()}
    # prose shares trigrams -> higher (less negative) than gibberish
    assert got[0] > got[2] and got[1] > got[2]
    assert got[3] is None and got[4] is None  # <3 chars -> NULL


def test_curate_corpus_optin_corpus_rules(spark):
    from scalecast_spark.datapipe.text import curate_corpus

    shared = "the quick brown fox jumps over the lazy dog every single day"
    rows = [
        (0, f"intro words here {shared} and some more trailing content okay"),
        (1, f"other beginning text {shared} with different ending words too"),
        (2, "zxqj vwkp qqzz xjvw pkqz mmnn ppqq rrss ttuu vvww xxyy zzaa"),
        (3, "completely natural unique sentence with ordinary vocabulary and structure"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # tiny-corpus trigram scores are compressed: doc2 (gibberish)
    # lands at -5.85, the prose docs at >= -5.64 — threshold between
    out = curate_corpus(
        df, max_dup_span_frac=0.4, min_tri_logprob=-5.7,
        min_quality=0.0, max_dup_line_frac=1.0, max_top2gram_frac=1.0,
    )
    got = {r["doc_id"]: set(r["drop_reasons"]) for r in out.collect()}
    assert "repeated_substrings" in got[0] and "repeated_substrings" in got[1]
    assert "low_lm_score" in got[2]  # gibberish trigram score
    assert got[3] == set()
    # default call: no corpus-level joins, columns absent
    plain = curate_corpus(df)
    assert "tri_logprob" not in plain.columns
    assert "n_dup_spans" not in plain.columns


def test_ivf_kmeans_quantizer(spark, sf_dir):
    """quantizer='kmeans': trained cells must preserve (or beat) the
    sampled quantizer's recall against brute force, and full-probe
    still recovers the exact top-k."""
    from scalecast_spark.datapipe import similarity
    from scalecast_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()]

    def recall(quant):
        got = [
            r["vec_id"]
            for r in similarity.ivf_topk(
                emb, q, k=10, n_cells=4, nprobe=2, quantizer=quant
            ).collect()
        ]
        return len(set(got) & set(exact)) / 10.0

    assert recall("kmeans") >= recall("sample") - 0.101  # never much worse
    # probing every trained cell recovers the exact ranking
    full = [
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, q, k=10, n_cells=4, nprobe=4, quantizer="kmeans"
        ).collect()
    ]
    assert full == exact
    with pytest.raises(ValueError, match="sample|kmeans"):
        similarity.ivf_topk(emb, q, quantizer="bogus")
