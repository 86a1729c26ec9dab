"""Hashing-trick document embeddings — a deterministic, dependency-free
text -> dense-vector bridge (Weinberger et al. 2009, "Feature Hashing
for Large Scale Multitask Learning"; the signed variant whose random
signs make component collisions unbiased).

Each token hashes to one of ``dim`` components with a +-1 sign, both
derived from its md5; a document's raw vector is the signed token-count
sum and the returned embedding is its L2 normalization.  No model, no
vocabulary, no external package — yet token-overlap cosine geometry is
preserved well enough that the embedding-space pipelines (SemDeDup,
k-means balancing, ANN, near-dup pairs) run END-TO-END from raw text
when no precomputed embedding column exists.  md5 (not xxhash64) so the
DuckDB oracle can replay the exact component/sign assignment — the same
convention as the MinHash signature oracle (dedup.py).

Scale shape: one corpus scan, explode to tokens (pre-explode
repartition opts the stage out of AQE's bytes-blind coalescing), then
ONE groupBy(id) whose ``dim`` conditional sums partial-aggregate
map-side — the shuffle carries (id, dim longs) per document, never
tokens.  The reference has no counterpart (scalecast is single-node
time-series only); this serves the LLM-datapipe layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from scalecast_spark.datapipe.dedup import _spread
from scalecast_spark.datapipe.text import _norm, split_words


#: above this dim the dense plan's per-component expressions stop
#: paying off: the groupBy emits ``dim`` CASE-WHEN sums and the norm a
#: ``dim``-term product chain, which leaves whole-stage codegen by
#: dim≈256 and exceeds the SQL parser's complexity cap outright at
#: dim=1024 (FAILED_TO_PARSE_TOO_COMPLEX, measured round 6) — while
#: real corpora have far fewer distinct tokens per doc than 256, so
#: the sparse representation is also smaller on the wire.
_DENSE_DIM_MAX = 128


def embed_docs(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """(id, embedding array<double>) — L2-normalized signed-hash
    bag-of-words vectors; NULL embedding for documents with no tokens
    (or the measure-zero case of fully cancelled signs).

    Token multiplicity counts (bag-of-words, the standard hashing
    trick), unlike SimHash's distinct-word signature.

    ``method``: ``'dense'`` aggregates ``dim`` conditional sums in one
    pass (fastest at small dim; expression count grows with dim and
    the plan degrades past ~256 — see ``_DENSE_DIM_MAX``); ``'sparse'``
    pre-aggregates signed counts per (doc, component) and scatters them
    into the array through a map lookup — expression count CONSTANT in
    dim, shuffle rows bounded by distinct components per doc (≤ tokens,
    ≤ dim), so it is the scale path for wide embeddings. Both paths
    sum the same integers in a different order, so they are
    BIT-IDENTICAL (asserted in tests/test_embed.py). ``'auto'`` picks
    dense for dim <= 128, sparse above.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2 (got {dim})")
    if method not in ("auto", "dense", "sparse"):
        raise ValueError(f"unknown method {method!r}")
    if method == "auto":
        method = "dense" if dim <= _DENSE_DIM_MAX else "sparse"
    toks = (
        df.repartition(_spread(df), id_col)
        .select(
            F.col(id_col).alias("_id"),
            # explode_outer: tokenless documents stay in the stream as
            # one NULL-token row (falls through every conditional sum to
            # an all-zero vector -> NULL embedding) — no re-attach join,
            # which at corpus scale would be a second shuffle
            F.explode_outer(split_words(_norm(F.col(text_col)))).alias("_w"),
        )
        .select(
            "_id",
            # one md5 per token; component and sign from disjoint hex
            # slices (first 8 = component, 9th nibble parity = sign)
            F.pmod(
                F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10).cast("long"),
                F.lit(dim),
            ).alias("_idx"),
            (
                F.conv(F.substring(F.md5("_w"), 9, 1), 16, 10).cast("long")
                % 2 * 2 - 1
            ).alias("_sgn"),
        )
    )
    if method == "sparse":
        # (id, component) signed counts first — the groupBy keys extend
        # the repartition's id-hash partitioning, so NEITHER aggregate
        # below re-shuffles (ClusteredDistribution(id, idx) is satisfied
        # by HashPartitioning(id)); the only wire cost stays the initial
        # id repartition. The NULL-token row of a tokenless document
        # falls out of the conditional collect (collect_list drops NULL
        # entries) leaving an empty map -> NULL norm -> NULL embedding,
        # same as the dense path's all-zero vector.
        cnt = toks.groupBy("_id", "_idx").agg(F.sum("_sgn").alias("_c"))
        return (
            cnt.groupBy("_id")
            .agg(
                F.expr(
                    "map_from_entries(collect_list("
                    "CASE WHEN _idx IS NOT NULL "
                    "THEN struct(_idx, _c) END))"
                ).alias("_m"),
                F.expr("sqrt(sum(_c * _c))").alias("_nrm"),
            )
            .select(
                F.col("_id").alias(id_col),
                F.expr(
                    f"CASE WHEN _nrm > 0 THEN transform("
                    f"sequence(0, {dim - 1}), "
                    f"i -> coalesce(CAST(_m[CAST(i AS BIGINT)] AS DOUBLE), "
                    f"CAST(0 AS DOUBLE)) / _nrm) END"
                ).alias(out_col),
            )
        )
    sums = toks.groupBy("_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN _idx = {i} THEN _sgn ELSE 0 END) AS _c{i}"
            )
            for i in range(dim)
        ]
    )
    comps = ", ".join(f"CAST(_c{i} AS DOUBLE)" for i in range(dim))
    ssq = " + ".join(f"_c{i} * _c{i}" for i in range(dim))
    # hoist the norm into its own projection: HOF lambdas run
    # interpreted with no subexpression elimination, so a norm expression
    # inside the transform would re-sum all dim squares per element
    return (
        sums.select(
            F.col("_id").alias(id_col),
            F.expr(f"array({comps})").alias("_arr"),
            F.expr(f"sqrt({ssq})").alias("_nrm"),
        )
        .select(
            id_col,
            F.expr(
                f"CASE WHEN _nrm > 0 "
                f"THEN transform(_arr, x -> x / _nrm) END"
            ).alias(out_col),
        )
    )


def embed_docs_rowwise(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Row-local twin of :func:`embed_docs`: the whole vector is folded
    from the token array inside one projection — no explode, no shuffle,
    no state — so it applies UNCHANGED to a readStream firehose (append
    mode) where the batch path's groupBy would need unbounded state.

    BIT-IDENTICAL to embed_docs: the signed counts are integer sums
    (order-free), so both paths feed the same exact integers into the
    same normalization arithmetic (asserted in tests/test_embed.py).
    Cost: the fold rebuilds a dim-length array per token (O(dim·tokens)
    per row, interpreted) — prefer the batch path for backfills and this
    one for incremental streams.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2 (got {dim})")
    nt = f"regexp_replace(lower(trim({text_col})), '\\\\s+', ' ')"
    toks = f"filter(split({nt}, ' '), x -> length(x) > 0)"
    pairs = (
        f"transform({toks}, w -> named_struct("
        f"'i', pmod(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT), {dim}), "
        f"'s', CAST(conv(substring(md5(w), 9, 1), 16, 10) AS BIGINT) % 2 * 2 - 1))"
    )
    counts = (
        f"aggregate({pairs}, array_repeat(CAST(0 AS BIGINT), {dim}), "
        f"(acc, x) -> transform(acc, (v, i) -> v + IF(x.i = i, x.s, CAST(0 AS BIGINT))))"
    )
    return (
        df.select(F.col(id_col), F.expr(counts).alias("_cnt"))
        .select(
            id_col,
            "_cnt",
            F.expr(
                "sqrt(aggregate(_cnt, CAST(0 AS BIGINT), "
                "(a, v) -> a + v * v))"
            ).alias("_nrm"),
        )
        .select(
            id_col,
            F.expr(
                "CASE WHEN _nrm > 0 "
                "THEN transform(_cnt, v -> CAST(v AS DOUBLE) / _nrm) END"
            ).alias(out_col),
        )
    )
