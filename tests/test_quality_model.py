"""Hashed-feature quality classifier (datapipe/quality_model):
distributed-GD training separates planted vocabularies; scoring is
scan-side; MLlib backend agrees on rankings."""

import pytest
from pyspark.sql import functions as F

from scalecast_spark.datapipe.quality_model import (
    hash_features,
    score_quality,
    train_quality_classifier,
)

GOOD_WORDS = ["science", "theory", "proof", "method", "result", "study"]
BAD_WORDS = ["buy", "click", "free", "winner", "casino", "pills"]


def _corpus(spark, n=60):
    rows = []
    for i in range(n):
        g = " ".join(GOOD_WORDS[(i + j) % len(GOOD_WORDS)] for j in range(12))
        b = " ".join(BAD_WORDS[(i + j) % len(BAD_WORDS)] for j in range(12))
        rows.append((2 * i, g, 1))
        rows.append((2 * i + 1, b, 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_features_are_sparse_normalized(spark):
    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    feats = hash_features(df, n_features=64).first()["features"]
    # tokens: a b a + bigrams: "a b" "b a" -> 5 tokens, a has count 2
    total = sum(p["val"] for p in feats)
    assert total == pytest.approx(1.0, abs=1e-9)
    assert all(0 <= p["idx"] < 64 for p in feats)
    vals = sorted(p["val"] for p in feats)
    assert vals[-1] == pytest.approx(2 / 5, abs=1e-9)


def test_gd_training_separates_vocabularies(spark):
    df = _corpus(spark)
    w = train_quality_classifier(df, "label", n_features=256, n_iter=25)
    assert len(w) == 257
    scored = score_quality(df, w)
    rows = scored.select("label", "q_model_score").collect()
    good = [r["q_model_score"] for r in rows if r["label"] == 1]
    bad = [r["q_model_score"] for r in rows if r["label"] == 0]
    assert min(good) > max(bad)  # perfect separation on train vocab
    # generalizes to unseen combinations of the same vocabularies
    test = spark.createDataFrame(
        [(900, "proof method study science"), (901, "free casino pills click")],
        ["doc_id", "text"],
    )
    s = {r["doc_id"]: r["q_model_score"] for r in score_quality(test, w).collect()}
    assert s[900] > 0.5 > s[901]


def test_training_is_deterministic(spark):
    df = _corpus(spark, n=20)
    w1 = train_quality_classifier(df, "label", n_features=128, n_iter=5)
    w2 = train_quality_classifier(df, "label", n_features=128, n_iter=5)
    assert w1 == w2


def test_mllib_backend_agrees_on_ranking(spark):
    df = _corpus(spark, n=30)
    w = train_quality_classifier(
        df, "label", n_features=256, backend="mllib"
    )
    assert len(w) == 257
    s = {r["doc_id"]: r["q_model_score"] for r in score_quality(df, w).collect()}
    good = [v for k, v in s.items() if k % 2 == 0]
    bad = [v for k, v in s.items() if k % 2 == 1]
    assert min(good) > max(bad)


def test_bad_backend_raises(spark):
    df = _corpus(spark, n=4)
    with pytest.raises(ValueError, match="backend"):
        train_quality_classifier(df, "label", backend="nope")


def test_md5_hasher_matches_independent_replay(spark):
    """hasher='md5' (the oracle-replayable bucket mode) must agree
    with an independent hashlib-based recomputation of the whole
    scoring chain — pins the digest slice (first 15 hex chars), the
    % n_features bucket map, the words+bigrams token set (repeats
    kept), and sigma(bias + sum w[idx]/n)."""
    import hashlib
    import math

    nf = 64
    w = [round(math.sin(1.0 + 0.37 * j) * 2.0, 6) for j in range(nf)]
    weights = w + [-0.125]
    texts = [
        (0, "Science theory  proof"),
        (1, "buy CLICK buy click buy"),
        (2, ""),          # empty doc scores the bias
        (3, "one"),       # single word: no bigrams
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["q_model_score"]
        for r in score_quality(df, weights, hasher="md5").collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % nf

    for doc_id, text in texts:
        words = [x for x in " ".join(text.lower().split()).split(" ") if x]
        toks = words + [
            f"{a} {b}" for a, b in zip(words, words[1:])
        ]
        dot = weights[-1] + (
            sum(w[bucket(t)] for t in toks) / len(toks) if toks else 0.0
        )
        want = round(1.0 / (1.0 + math.exp(-dot)), 6)
        assert got[doc_id] == pytest.approx(want, abs=1e-9), (doc_id, text)


def test_md5_hasher_trains_and_scores_consistently(spark):
    """Training with hasher='md5' separates the planted vocabularies
    exactly like the xxhash64 path (the feature map is part of the
    model; only the bucket permutation differs)."""
    df = _corpus(spark, n=20)
    w = train_quality_classifier(
        df, "label", n_features=256, n_iter=15, hasher="md5"
    )
    s = {
        r["doc_id"]: r["q_model_score"]
        for r in score_quality(df, w, hasher="md5").collect()
    }
    good = [v for k, v in s.items() if k % 2 == 0]
    bad = [v for k, v in s.items() if k % 2 == 1]
    assert min(good) > max(bad)


def test_bad_hasher_raises(spark):
    df = _corpus(spark, n=2)
    with pytest.raises(ValueError, match="hasher"):
        score_quality(df, [0.0] * 65, hasher="sha1").collect()
