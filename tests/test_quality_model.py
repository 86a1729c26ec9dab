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
