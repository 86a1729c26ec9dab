"""Trainable document-quality classifier — the modern curation step
(FineWeb-Edu / DCLM-style): label a small seed set, train a cheap
linear model on hashed n-gram features, score the whole corpus at
scan speed.

Feature space: the fastText/Vowpal hashing trick — tokens (and
optionally word bigrams) hash into ``n_features`` buckets (xxhash64
by default; ``hasher='md5'`` for the cross-engine-replayable mode the
oracle gate certifies), values are L1-normalized counts. No
vocabulary is ever built or shipped: the feature map is a pure
function of the text, so scoring is a scan-side projection on any
engine.

Two trainers:
  * ``backend='gd'`` (default) — full-batch logistic regression by
    distributed gradient descent. The DRIVER holds only the
    (n_features+1) weight vector; each iteration is ONE scan that
    computes per-feature gradient sums via explode → groupBy(idx) —
    shuffle and driver state bounded by n_features, never by corpus
    size (the same partial-aggregate shape as the k-means mean
    update). Deterministic: no RNG, fixed iteration count, zero init.
  * ``backend='mllib'`` — Spark MLlib LogisticRegression on the same
    hashed features (production option: L-BFGS, regularization).

Reference: scalecast has no analogue; this is LLM-curation depth.
Public method references: Weinberger et al. 2009 (feature hashing),
Joulin et al. 2016 (fastText).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from scalecast_spark.datapipe.text import _norm, ngram_chain, split_words


def _bucket(tok: Column, n_features: int, hasher: str) -> Column:
    """Hash one token to a bucket index in [0, n_features).

    ``hasher='xxhash64'`` (default) is the fast production path;
    ``hasher='md5'`` takes the first 60 bits of the md5 digest
    (non-negative, so pmod == %) — slower, but bit-identical across
    engines, which is what lets a fixed-weight scoring pass be
    hash-certified against a plain-SQL oracle (the same cross-engine
    convention as dedup.py's minhash/simhash family)."""
    if hasher == "md5":
        h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    elif hasher == "xxhash64":
        h = F.xxhash64(tok)
    else:
        raise ValueError(
            f"hasher must be 'xxhash64' or 'md5'; got {hasher!r}"
        )
    return F.pmod(h, F.lit(n_features)).cast("int")


def _idxs_from_words(
    words: Column, n_features: int, bigrams: bool, hasher: str = "xxhash64"
) -> Column:
    """array<int> of hashed token (+ bigram) bucket indices, one entry
    PER TOKEN (repeats kept), from a MATERIALIZED words-array column.
    The classifier's hot paths run directly on this: w·x over
    L1-normalized counts == (Σ_tokens w[idx]) / n, and the gradient
    explode emits one (idx, 1/n) row per token — no per-row pair
    construction at all.

    Callers must pass a projected COLUMN, not a raw split expression:
    ngram_chain references ``words`` n+1 times and interpreted HOFs
    get no subexpression elimination, so an inline expression would
    re-run the normalize+split chain per reference (the repo's
    measured 20x pitfall)."""
    toks = F.concat(words, ngram_chain(words, 2)) if bigrams else words
    return F.transform(toks, lambda t: _bucket(t, n_features, hasher))


def _with_idxs(
    df: DataFrame,
    text_col: str,
    n_features: int,
    bigrams: bool,
    out: str,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Project the words array once, then derive the index array from
    the materialized column."""
    w = "_qm_words"
    while w in df.columns:
        w = "_" + w
    return df.withColumn(w, split_words(_norm(F.col(text_col)))).withColumn(
        out, _idxs_from_words(F.col(w), n_features, bigrams, hasher)
    ).drop(w)


def _feature_pairs(
    text_col: Column, n_features: int, bigrams: bool,
    hasher: str = "xxhash64",
) -> Column:
    """array<struct<idx int, val double>> of L1-normalized hashed
    token (+ bigram) counts — the materialized sparse-vector view for
    external consumers (hash_features / MLlib densification).

    Linear construction (round 11; the previous run-length fold
    concatenated its output array per element — O(tokens²) copying per
    document): sort the per-token bucket indices, mark each run START
    (position 0 or value change), then each run's count is the gap to
    the NEXT start — two filter/zip passes over the sorted array, no
    quadratic concat. The GD trainer and scorer still run on
    :func:`_idxs_from_words` directly (they never need the counted
    view)."""
    words = split_words(_norm(text_col))
    sorted_idx = F.array_sort(
        _idxs_from_words(words, n_features, bigrams, hasher)
    )
    n = F.size(sorted_idx)
    # 0-based positions where a new run starts
    starts = F.filter(
        F.sequence(F.lit(0), n - 1),
        # CASE WHEN, not |, so element_at(.., 0) is never evaluated
        # for the first position (ANSI mode errors on index 0)
        lambda i: F.when(i == 0, F.lit(True)).otherwise(
            F.element_at(sorted_idx, i + 1)
            != F.element_at(sorted_idx, i)
        ),
    )
    # pair each start with the following start (n past the last run)
    nexts = F.concat(F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))), F.array(n))
    return F.when(n == 0, F.array().cast(
        "array<struct<idx:int,val:double>>"
    )).otherwise(
        F.zip_with(
            starts,
            nexts,
            lambda s, e: F.struct(
                F.element_at(sorted_idx, s + 1).alias("idx"),
                ((e - s) / n.cast("double")).alias("val"),
            ),
        )
    )


def hash_features(
    df: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    bigrams: bool = True,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Adds ``features``: array<struct<idx,val>> hashed-n-gram vector
    (sparse, L1-normalized). Pure scan-side projection."""
    return df.withColumn(
        "features",
        _feature_pairs(F.col(text_col), n_features, bigrams, hasher),
    )


def _dot_w_idxs(idxs: Column, w_lit: Column) -> Column:
    """w·x + b for one row over the PER-TOKEN index array: with
    L1-normalized counts, w·x = (Σ_tokens w[idx]) / n_tokens — one
    linear fold, no pair materialization. Empty docs score the bias."""
    n = F.size(idxs)
    tok_sum = F.aggregate(
        idxs,
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(w_lit, i + 1),
    )
    return F.element_at(w_lit, -1) + F.when(
        n > 0, tok_sum / n.cast("double")
    ).otherwise(F.lit(0.0))


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    n_features: int = 1024,
    text_col: str = "text",
    bigrams: bool = True,
    n_iter: int = 30,
    lr: float = 2.0,
    reg: float = 1e-4,
    backend: str = "gd",
    hasher: str = "xxhash64",
) -> list[float]:
    """Train logistic regression on hashed features; returns the
    weight vector (length n_features+1, last = bias) for
    :func:`score_quality`.

    'gd': full-batch gradient descent, ``n_iter`` scans; per-scan the
    per-feature gradient Σ (σ(w·x)−y)·x_j aggregates via explode →
    groupBy(idx) with map-side combine — ≤ n_features+1 rows ever
    reach the driver. 'mllib': pyspark.ml LogisticRegression on the
    same features (sparse vectors)."""
    if backend == "mllib":
        return _train_mllib(
            df, label_col, n_features, text_col, bigrams, reg, hasher
        )
    if backend != "gd":
        raise ValueError(f"backend must be gd|mllib, got {backend!r}")
    feats = _with_idxs(
        df.select(F.col(label_col).cast("double").alias("_y"), text_col),
        text_col, n_features, bigrams, "_idxs", hasher,
    ).select("_y", "_idxs").withColumn("_nt", F.size("_idxs"))
    feats = feats.localCheckpoint(eager=False)
    n = feats.count()
    w = [0.0] * (n_features + 1)
    from scalecast_spark.datapipe.similarity import _lit_vec

    for _ in range(n_iter):
        w_lit = _lit_vec(w)
        err = (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-_dot_w_idxs(F.col("_idxs"), w_lit)))
        ) - F.col("_y")
        # per-feature gradient: one row PER TOKEN carrying err/n_tokens
        # (== err·val for the normalized count vector) plus one bias
        # row per doc — map-side combine bounds the shuffle by
        # n_features+1 keys
        g = (
            feats.withColumn("_e", err)
            .select(
                (F.col("_e") / F.greatest(F.col("_nt"), F.lit(1)).cast("double")).alias("_ev"),
                "_e",
                F.explode(
                    F.concat(
                        F.col("_idxs"), F.array(F.lit(n_features).cast("int"))
                    )
                ).alias("_i"),
            )
            .groupBy("_i")
            .agg(
                F.sum(
                    F.when(F.col("_i") == n_features, F.col("_e")).otherwise(
                        F.col("_ev")
                    )
                ).alias("_g")
            )
            .collect()
        )
        grad = {r["_i"]: r["_g"] for r in g}
        w = [
            wi - lr * (grad.get(i, 0.0) / n + reg * wi)
            for i, wi in enumerate(w)
        ]
    return w


def _train_mllib(df, label_col, n_features, text_col, bigrams, reg,
                 hasher="xxhash64"):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = hash_features(df, n_features, text_col, bigrams, hasher)
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda i: F.coalesce(
            F.element_at(
                F.map_from_entries(F.col("features")), i.cast("int")
            ),
            F.lit(0.0),
        ),
    )
    train = feats.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(dense).alias("features"),
    )
    model = LogisticRegression(regParam=reg, standardization=False).fit(train)
    return [float(x) for x in model.coefficients] + [float(model.intercept)]


def score_quality(
    df: DataFrame,
    weights: list[float],
    n_features: int | None = None,
    text_col: str = "text",
    bigrams: bool = True,
    threshold: float = 0.5,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Score every document with a trained classifier: adds
    ``q_model_score`` = σ(w·x) and ``q_model_keep``. Scan-side only —
    the weight vector enters as one literal array (no join, no
    shuffle), so this runs at full scan speed on any corpus. Pass the
    SAME ``hasher`` the weights were trained with (the feature map is
    part of the model)."""
    from scalecast_spark.datapipe.dedup import _spread
    from scalecast_spark.datapipe.similarity import _lit_vec

    nf = (len(weights) - 1) if n_features is None else n_features
    # spread the hash-projection off a single-partition scan (guide
    # §2.5): the per-row split/hash/dot work is the whole cost and
    # would serialize on one core; pure per-row math, so partitioning
    # cannot change any score.
    out = _with_idxs(
        df.repartition(_spread(df)), text_col, nf, bigrams, "_fp", hasher
    )
    score = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-_dot_w_idxs(F.col("_fp"), _lit_vec(weights)))
    )
    return (
        out.withColumn("q_model_score", F.round(score, 6))
        .withColumn("q_model_keep", F.col("q_model_score") >= threshold)
        .drop("_fp")
    )
