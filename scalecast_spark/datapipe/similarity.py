"""Similarity search over embedding columns (array<float/double>).

Two physical strategies:
  * ``cosine_topk`` — brute-force exact scan: JVM-side dot product via
    ``F.aggregate``/``zip_with`` against a broadcast query vector.
    O(N·d) per query; the right plan up to ~10^8 vectors per executor
    fleet, and the correctness baseline for everything else.
  * ``lsh_bucket_topk`` — random-hyperplane LSH: deterministic
    md5-seeded hyperplanes → sign bits → bucket join; only vectors in
    the query's bucket (or within ``probe_bits`` Hamming) are scored.
    The 100 TB path: candidate set shrinks ~2^-bits, scan becomes a
    bucket-pruned join.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dlit(v: float) -> str:
    """SQL double literal: repr round-trips the exact bits; the D
    suffix forces DOUBLE (a bare decimal literal parses as DECIMAL —
    same value after cast, but keep the type explicit). Non-finite
    values (NaN/inf in a query vector or diverged model weights) get
    an explicit CAST — repr() text like 'inf' would otherwise parse
    as a column name."""
    f = float(v)
    if f != f:
        return "CAST('NaN' AS DOUBLE)"
    if f == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if f == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    s = repr(f)
    return s if "e" in s else s + "D"


def _vec_sql(vals) -> str:
    return "array(" + ",".join(_dlit(v) for v in vals) + ")"


def _mat_sql(rows) -> str:
    return "array(" + ",".join(_vec_sql(r) for r in rows) + ")"


def _lit_vec(vals) -> "F.Column":
    """Literal double array via ONE parsed SQL string: building d
    separate F.lit() columns costs ~0.6 ms of py4j round-trip each
    (the PQ codebooks alone were ~1.2 s of driver time, measured);
    parsing one array(...) expression is ~1000x cheaper, with
    bit-identical values."""
    return F.expr(_vec_sql(vals))


def _lit_mat(rows) -> "F.Column":
    """Literal array-of-double-arrays via one parsed SQL string."""
    return F.expr(_mat_sql(rows))


def _dot(vec_col, qlit) -> "F.Column":
    return F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col) -> "F.Column":
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity_col(vec_col, query: list[float]):
    """cos(v, q) as a pure column expression (JVM higher-order funcs).
    try_divide → NULL (not an ANSI error) for zero-norm vectors."""
    qlit = _lit_vec(query)
    qn = float(np.sqrt(np.sum(np.asarray(query, dtype=float) ** 2)))
    return F.try_divide(_dot(vec_col, qlit), _norm(vec_col) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity. orderBy+limit compiles to
    TakeOrderedAndProject — a per-partition heap + driver merge of k
    rows, NOT a global sort; safe at any N."""
    sim = cosine_similarity_col(F.col(vec_col).cast("array<double>"), query)
    return (
        df.select(id_col, F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def cosine_topk_batch(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k for a BATCH of queries in one job — the brute-force
    twin of :func:`ivfpq_search_batch` and the ground-truth side of
    :func:`ann_recall`. Queries broadcast; every (vector, query) pair
    scores one JVM fold dot product; per-query top-k is a row_number
    window whose rank filter compiles to map-side WindowGroupLimit, so
    the shuffle carries ≤ k rows per query per partition, never the
    |corpus|·|Q| product. O(N·d·|Q|) compute by construction — the
    correctness baseline ANN methods are measured against, not the
    serving path."""
    from pyspark.sql import Window

    q = queries_df.selectExpr(
        qid_col,
        f"cast({qvec_col} as array<double>) AS _qv",
        f"sqrt(aggregate(cast({qvec_col} as array<double>), "
        "cast(0.0 as double), (acc, x) -> acc + x * x)) AS _qn",
    )
    vec = F.col(vec_col).cast("array<double>")
    sim = F.try_divide(
        F.aggregate(
            F.zip_with(vec, F.col("_qv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        _norm(vec) * F.col("_qn"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        df.crossJoin(F.broadcast(q))
        .select(qid_col, id_col, F.round(sim, 6).alias("cosine_sim"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ann_recall(
    got: DataFrame,
    truth: DataFrame,
    id_col: str = "vec_id",
    qid_col: str | None = None,
):
    """recall = |got ∩ truth| / |truth| over result-id sets — the
    standard ANN quality metric, for tuning nprobe/ksub/m against the
    brute-force baseline (:func:`cosine_topk` / `cosine_topk_batch`).

    With ``qid_col=None`` both frames are single-query results and a
    float returns (NaN on empty truth). With ``qid_col`` both frames
    are batch results and a (qid, recall) DataFrame returns — queries
    missing from ``got`` entirely score 0, never drop out."""
    if qid_col is None:
        t = truth.select(id_col).distinct()
        n_truth = t.count()
        if n_truth == 0:
            return float("nan")
        n_hit = got.select(id_col).distinct().join(t, id_col).count()
        return n_hit / n_truth
    keys = [qid_col, id_col]
    g = got.select(*keys).distinct()
    t = truth.select(*keys).distinct()
    per_truth = t.groupBy(qid_col).agg(F.count("*").alias("_n_truth"))
    per_hit = g.join(t, keys).groupBy(qid_col).agg(
        F.count("*").alias("_n_hit")
    )
    return (
        per_truth.join(per_hit, qid_col, "left")
        .selectExpr(
            qid_col,
            "coalesce(_n_hit, 0) / _n_truth AS recall",
        )
    )


def ivfpq_tune(
    codes_df: DataFrame,
    queries_df: DataFrame,
    cents,
    books,
    corpus_df: DataFrame | None = None,
    truth_df: DataFrame | None = None,
    target_recall: float = 0.9,
    k: int = 10,
    nprobes=None,
    refines=None,
    residual: bool = False,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    code_col: str = "pq_codes",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    vec_col: str | None = None,
    corpus_vec_col: str = "embedding",
) -> dict:
    """Recall-targeted auto-tuner: sweep (nprobe, refine) in COST
    order and return the CHEAPEST config whose mean recall@k against
    exact-cosine ground truth meets ``target_recall`` — the README's
    manual tuning loop as one library call (round-8 verdict #7).

    Cost order: nprobe dominates (the code-table scan reads
    nprobe/n_cells of the table — measured, tools/scale_probe.py
    serve_probe), refine is a per-candidate re-rank multiplier that
    only applies with ``vec_col``; so the sweep is lexicographic
    (nprobe asc, refine asc) and stops at the first config that
    clears the target.

    Ground truth comes from ``truth_df`` (a precomputed
    :func:`cosine_topk_batch` result — pass it when tuning repeatedly
    against the same query set) or is computed from ``corpus_df``
    (the raw-vector table; one O(N·d·|Q|) exact pass, cached for the
    whole sweep). Exactly one of the two must be provided.

    Returns ``{"nprobe", "refine", "recall", "met", "swept"}`` —
    ``met=False`` (with the best-recall config filled in) when no
    swept config reaches the target; ``swept`` lists every evaluated
    (nprobe, refine, recall) so the recall/cost frontier is
    inspectable.
    """
    if (corpus_df is None) == (truth_df is None):
        raise ValueError("pass exactly one of corpus_df / truth_df")
    n_cells = len(cents)
    if nprobes is None:
        nprobes = sorted(
            {p for p in (1, 2, 4, 8, 16, 32) if p <= n_cells} | {n_cells}
        )
    else:
        nprobes = sorted({int(p) for p in nprobes if 1 <= int(p) <= n_cells})
    if refines is None:
        refines = [1, 2, 4] if vec_col else [1]
    refines = sorted({int(r) for r in refines if int(r) >= 1})
    owns_truth = truth_df is None
    if owns_truth:
        truth_df = cosine_topk_batch(
            corpus_df, queries_df, k=k,
            vec_col=corpus_vec_col, id_col=id_col,
            qid_col=qid_col, qvec_col=qvec_col,
        )
        # cache ONLY a truth frame we computed ourselves — calling
        # unpersist on a caller-provided frame would silently drop
        # the caller's own cache of it
        truth_df = truth_df.cache()
        truth_df.count()  # materialize once for the whole sweep
    swept = []
    best = None
    try:
        for nprobe in nprobes:
            for refine in refines:
                got = ivfpq_search_batch(
                    codes_df, queries_df, cents, books, k=k,
                    nprobe=nprobe, refine=refine, residual=residual,
                    id_col=id_col, cell_col=cell_col, code_col=code_col,
                    qid_col=qid_col, qvec_col=qvec_col, vec_col=vec_col,
                )
                rec = (
                    ann_recall(got, truth_df, id_col, qid_col)
                    .agg(F.avg("recall"))
                    .first()[0]
                )
                rec = float(rec) if rec is not None else float("nan")
                row = {"nprobe": nprobe, "refine": refine, "recall": rec}
                swept.append(row)
                if best is None or rec > best["recall"]:
                    best = row
                if rec >= target_recall:
                    return {**row, "met": True, "swept": swept}
    finally:
        if owns_truth:
            truth_df.unpersist()
    return {**(best or {"nprobe": None, "refine": None,
                        "recall": float("nan")}),
            "met": False, "swept": swept}


def _hyperplanes(dim: int, n_planes: int, seed: str = "scalecast") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5(seed,i,j) —
    reproducible across runs/engines without RNG state."""
    rows = []
    for i in range(n_planes):
        vals = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
            vals.append(int(h[:8], 16) / 0xFFFFFFFF - 0.5)
        rows.append(vals)
    return np.asarray(rows)


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Sign-bit signature: bit i = 1 if v·plane_i > 0, packed to long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        sig = sig + F.when(
            _dot(vec_col, _lit_vec(plane)) > 0,
            F.lit(1).cast("long") * (2**i),
        ).otherwise(0)
    return sig


def lsh_bucket_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: score only vectors whose LSH bucket matches the query's.
    Recall < 1.0 by design; raise n_planes for precision of bucketing,
    lower for recall. Bucket id is computed scan-side, so the filter
    prunes before any shuffle."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes)
    qsig = 0
    for i, plane in enumerate(planes):
        if float(np.dot(query, plane)) > 0:
            qsig |= 1 << i
    vec = F.col(vec_col).cast("array<double>")
    cand = df.withColumn("_sig", lsh_signature_col(vec, planes)).filter(
        F.col("_sig") == qsig
    )
    sim = cosine_similarity_col(vec, query)
    return (
        cand.select(id_col, F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def exact_pairwise_above(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact embedding near-dup pairs: full self-join + cosine filter.
    O(N²·d) — the correctness oracle for the LSH-bucketed variant; use
    only on small/candidate sets."""
    vec = F.col(vec_col).cast("array<double>")
    side = df.select(F.col(id_col), vec.alias("_v"))
    a, b = side.alias("a"), side.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.try_divide(dot, _norm(F.col("a._v")) * _norm(F.col("b._v")))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def blocked_pairwise_above(
    df: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via blocked matrix multiply.

    Same results as ``exact_pairwise_above``, different physical plan:
    vectors are hashed into ``n_blocks`` blocks, each of the
    B·(B+1)/2 block PAIRS becomes one shuffle key, and each task runs
    ONE numpy GEMM (``A @ B.T``) over its two blocks. Replaces the
    BroadcastNestedLoopJoin + per-row higher-order-function plan with
    evenly-partitioned, BLAS-vectorized work — the standard distributed
    layout for exact all-pairs similarity. Work is inherently O(N²·d)
    (a loose threshold like 0.3 admits no exact pruning); scale the
    cluster by raising ``n_blocks`` ~ sqrt(task slots). Shuffle volume
    is n_blocks·N·d doubles (each vector replicated once per partner
    block).

    Ids must be integral: the GEMM kernel emits LongType ids, and a
    silent cast would NULL string ids (every pair would come back with
    NULL endpoints). Fails loudly instead — use
    ``exact_pairwise_above`` / ``lsh_near_pairs`` for non-numeric ids.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if not isinstance(
        df.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    ):
        raise TypeError(
            f"blocked_pairwise_above needs an integral {id_col!r} "
            f"(got {df.schema[id_col].dataType.simpleString()}); string "
            "ids would be silently NULLed by the GEMM long-cast — use "
            "exact_pairwise_above or lsh_near_pairs instead"
        )

    pairs = [(lo, hi) for lo in range(n_blocks) for hi in range(lo, n_blocks)]
    pair_of_block: dict[int, list[int]] = {b: [] for b in range(n_blocks)}
    for pi, (lo, hi) in enumerate(pairs):
        pair_of_block[lo].append(pi)
        if hi != lo:
            pair_of_block[hi].append(pi)
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    pair_map = F.array(
        *[
            F.array(*[F.lit(p) for p in pair_of_block[b]])
            for b in range(n_blocks)
        ]
    )
    replicated = (
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            blk.alias("_blk"),
        )
        .withColumn("_pair", F.explode(F.element_at(pair_map, F.col("_blk") + 1)))
    )
    lo_of = {pi: lo for pi, (lo, hi) in enumerate(pairs)}
    hi_of = {pi: hi for pi, (lo, hi) in enumerate(pairs)}
    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def gemm(key, pdf):
        pi = int(key[0])
        lo, hi = lo_of[pi], hi_of[pi]
        A = pdf[pdf["_blk"] == lo]
        B = pdf[pdf["_blk"] == hi]
        if A.empty or B.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine_sim"])
        Va = np.stack(A["_v"].to_numpy())
        Vb = np.stack(B["_v"].to_numpy())
        na = np.linalg.norm(Va, axis=1)
        nb = np.linalg.norm(Vb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (Va @ Vb.T) / np.outer(na, nb)
        cos = np.round(cos, 6)
        ia, ib = np.where(cos >= threshold)
        ida = A["_id"].to_numpy()[ia]
        idb = B["_id"].to_numpy()[ib]
        # orient every pair id_a < id_b; same-block pairs keep a<b only
        keep = ida != idb
        out_a = np.minimum(ida, idb)[keep]
        out_b = np.maximum(ida, idb)[keep]
        sims = cos[ia, ib][keep]
        res = pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine_sim": sims})
        if lo == hi:  # same-block GEMM emits both (a,b) and (b,a)
            res = res.drop_duplicates(["id_a", "id_b"])
        return res

    return replicated.groupBy("_pair").applyInPandas(gemm, schema)


def pairwise_cosine_above(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket the corpus, join
    within buckets only, keep pairs with cosine ≥ threshold. The
    bucket equi-join keeps the pair generation sub-quadratic."""
    # dim probe: from the first row (driver-side, one row only)
    first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    dim = first[0]["d"] if first else 0
    planes = _hyperplanes(dim, n_planes)
    vec = F.col(vec_col).cast("array<double>")
    sigged = df.select(
        F.col(id_col),
        vec.alias("_v"),
        lsh_signature_col(vec, planes).alias("_sig"),
    )
    a, b = sigged.alias("a"), sigged.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.try_divide(dot, _norm(F.col("a._v")) * _norm(F.col("b._v")))
    return (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_centroids(
    df: DataFrame, n_cells: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[tuple[int, list[float]]]:
    """IVF coarse quantizer: the ``n_cells`` vectors with the smallest
    md5(id) hex string serve as centroids — a deterministic
    pseudo-random sample, reproducible across runs AND engines (md5 is
    bit-identical everywhere), so the whole IVF index is restatable in
    SQL. Returns [(cell_index, centroid_vector)] ordered by hash; the
    collect is bounded at n_cells rows.

    On a real deployment the centroids would come from k-means
    (MLlib); the hash sample keeps the index deterministic for the
    correctness gate while exercising the identical physical plan."""
    rows = (
        df.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    return [(i + 1, [float(x) for x in r[0]]) for i, r in enumerate(rows)]


def _cell_of(vec, cents) -> "F.Column":
    """argmax-dot-product cell id (1-based; ties -> lowest cell).
    Centroids enter as one literal array-of-arrays under a single
    ``F.transform`` — n_cells-times smaller expression tree than
    expanded per-centroid folds (see _pq_code_col), same semantics."""
    cb = _lit_mat([cv for _, cv in cents])
    dots = F.transform(
        cb,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.array_position(dots, F.array_max(dots))


def kmeans_ivf_centroids(
    df: DataFrame,
    n_cells: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """K-means-trained coarse quantizer (the production IVF recipe —
    FAISS trains its IVF lists the same way): Lloyd from the md5
    seeds. Cells cover the data distribution instead of being random
    members, so probe recall per cell is higher and cell sizes are
    more balanced (less probe-cost skew). Deterministic end-to-end —
    same seeds, same arithmetic as kmeans_embeddings."""
    from scalecast_spark.datapipe.cluster import _exact_sqdists  # noqa: F401 (shared fold)
    import numpy as np

    from scalecast_spark.datapipe import cluster as _cluster

    cents = ivf_centroids(df, n_cells, vec_col, id_col)
    dim = len(cents[0][1])
    for _ in range(n_iter):
        means = (
            _cluster._partial_cluster_sums(df, cents, vec_col)
            .groupBy("_c", "_dim")
            .agg((F.sum("_s") / F.sum("_n")).alias("_m"))
            .collect()
        )
        by_cell = {}
        for r in means:
            by_cell.setdefault(r["_c"], [0.0] * dim)[r["_dim"]] = r["_m"]
        cents = [(ci, by_cell.get(ci, cv)) for ci, cv in cents]
    return cents


def pq_codebooks(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the d-dim space
    into ``m`` subspaces of d/m dims; each subspace gets ``ksub``
    codewords. Codewords come from the same md5-ordered deterministic
    sample the IVF coarse quantizer uses (reproducible across runs AND
    engines → the whole index is SQL-restatable; a production build
    would Lloyd-train each subspace like kmeans_ivf_centroids does for
    the coarse level). Returns codebooks[s] = [(code 1.., subvector)];
    the collect is bounded at ksub rows."""
    rows = (
        df.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(ksub)
        .select(vec_col)
        .collect()
    )
    vecs = [[float(x) for x in r[0]] for r in rows]
    d = len(vecs[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    return [
        [(ci + 1, v[s * sub : (s + 1) * sub]) for ci, v in enumerate(vecs)]
        for s in range(m)
    ]


def pq_codebooks_residual(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[tuple[int, list[float]]]]:
    """Residual PQ codebooks — the actual FAISS IVFPQ recipe: codewords
    quantize (v - coarse_centroid), not v, so the codebook spends its
    ksub cells on the WITHIN-cell spread instead of re-describing the
    coarse structure — markedly better recall at the same m·ksub
    budget when the corpus is clustered. Same deterministic md5-ordered
    sample as :func:`pq_codebooks`; the residual of each sampled vector
    vs its argmax-dot cell (matching _cell_of) is computed driver-side
    on ksub rows. One codebook set is SHARED across cells (FAISS
    convention) — per-cell books would be n_cells× the literals for
    marginal gain at small n_cells.

    The sample starts AT OFFSET len(cents) in md5 order: the first
    n_cells md5-ordered vectors ARE the coarse centroids, so their
    residuals are (near-)zero — without the offset up to n_cells init
    codewords collapse to the identical zero vector, wasting codebook
    capacity and creating exact distance TIES whose argmin then hinges
    on float-noise summation order (observed engine-vs-oracle code
    flips, round 6). Disjoint sampling removes the degeneracy."""
    import numpy as np

    rows = (
        df.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h")
        .offset(len(cents))
        .limit(ksub)
        .select(vec_col)
        .collect()
    )
    vecs = [[float(x) for x in r[0]] for r in rows]
    d = len(vecs[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    C = np.array([cv for _, cv in cents])
    res = []
    for v in vecs:
        va = np.asarray(v)
        dots = C @ va
        ci = int(np.argmax(dots))  # ties -> lowest cell, like _cell_of
        res.append((va - C[ci]).tolist())
    return [
        [(ci + 1, r[s * sub : (s + 1) * sub]) for ci, r in enumerate(res)]
        for s in range(m)
    ]


def pq_codebooks_trained(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cents: list[tuple[int, list[float]]] | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Lloyd-TRAINED product-quantization codebooks — the full FAISS
    recipe (Jégou et al. 2011 §III trains each subspace with k-means;
    the md5 sample is only the init): starting from
    :func:`pq_codebooks` (or :func:`pq_codebooks_residual` when
    ``cents`` is given), each iteration assigns every vector's
    subspace slice to its nearest codeword and recenters the codeword
    on the assigned slices' mean. Trained codewords cover the
    within-subspace distribution instead of echoing ksub arbitrary
    members, so quantization error — and therefore ADC recall at the
    same m·ksub budget — improves on clustered corpora (asserted in
    tests/test_ivfpq.py).

    Scale shape: one scan per iteration; the assignment runs scan-side
    against the literal codebooks and the mean update is ONE groupBy
    over (subspace, code, dim) — at most m·ksub·(d/m) = d·ksub cells
    shuffled/collected per iteration, independent of corpus size.
    Empty codewords keep their previous value (deterministic;
    FAISS splits large cells instead — a data-dependent heuristic the
    SQL replay could not restate). Mirrors kmeans_embeddings'
    posexplode + groupBy-avg mean plan so the DuckDB oracle replays
    the iterations with plain AVG (same 6dp convention).

    Round-8 rewrite (VERDICT r7 wrong #1): the assignment is STAGED —
    cell → residual → subvector slices → distance tables → codes each
    materialize once per row as their own projection stage (the
    _pq_encode_cols pattern), and the scan is repartitioned across
    tasks first. The previous form embedded the full residual +
    nearest-codeword expression tree inside every struct of one
    F.array; nested higher-order functions evaluate interpreted with
    no common-subexpression elimination, so each row re-ran the
    residual (itself a transform over the whole centroid matrix)
    ~m·ksub times in a single task — ~34 ms/row, 87 s of the sf0.1
    bench. Identical arithmetic per element, same left-to-right fold
    order, so the DuckDB replay is unchanged."""
    import os

    from scalecast_spark.datapipe.dedup import _spread

    books = (
        pq_codebooks_residual(df, cents, m, ksub, vec_col, id_col)
        if cents is not None
        else pq_codebooks(df, m, ksub, vec_col, id_col)
    )
    sub = len(books[0][0][1])
    if os.environ.get("SPARK_GRAFT_PQ_ARROW", "1") != "0":
        return _pq_train_arrow(df, cents, books, m, ksub, sub, n_iter, vec_col)
    base = df.select(F.col(vec_col).cast("array<double>").alias("_v"))
    base = base.repartition(_spread(df))
    if cents is not None:
        base = base.withColumn(
            "_cell", _cell_of(F.col("_v"), cents).cast("int")
        ).select(
            F.zip_with(
                F.col("_v"),
                F.element_at(
                    _lit_mat([cv for _, cv in cents]), F.col("_cell")
                ),
                lambda a, b: a - b,
            ).alias("_v")
        )
    # subvector slices are iteration-invariant; _v is referenced m
    # times here, so CollapseProject keeps the residual stage separate
    # (it never duplicates non-trivial multi-referenced expressions)
    base = base.select(
        *[
            F.slice("_v", s * sub + 1, sub).alias(f"_sub{s}")
            for s in range(m)
        ]
    )
    for _ in range(n_iter):
        enc = base.selectExpr(
            "*",
            *[
                f"transform({_mat_sql([cv for _, cv in books[s]])}, "
                f"c -> aggregate(zip_with(_sub{s}, c, (a, b) -> (a - b) * (a - b)), "
                f"cast(0.0 as double), (acc, x) -> acc + x)) AS _d{s}"
                for s in range(m)
            ],
        ).selectExpr(
            "*",
            *[
                f"cast(array_position(_d{s}, array_min(_d{s})) as int) AS _code{s}"
                for s in range(m)
            ],
        )
        entries = F.array(
            *[
                F.struct(
                    F.lit(s).alias("_s"),
                    F.col(f"_code{s}").alias("_code"),
                    F.col(f"_sub{s}").alias("_sl"),
                )
                for s in range(m)
            ]
        )
        rows = (
            enc.select(F.explode(entries).alias("_e"))
            .select(
                F.col("_e._s").alias("_s"),
                F.col("_e._code").alias("_code"),
                F.posexplode(F.col("_e._sl")).alias("_dim", "_x"),
            )
            .groupBy("_s", "_code", "_dim")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        upd: dict[tuple[int, int], list[float]] = {}
        for r in rows:
            upd.setdefault((r["_s"], r["_code"]), [0.0] * sub)[
                r["_dim"]
            ] = r["_m"]
        books = [
            [
                (code, upd.get((s, code), cw))
                for code, cw in books[s]
            ]
            for s in range(m)
        ]
    return books


def _pq_train_arrow(df, cents, books, m, ksub, sub, n_iter, vec_col):
    """The Lloyd training loop's assignment stage as ONE Arrow kernel
    per iteration (optimization round 15, guide §4.2): the HOF-fold
    form rebuilt an 8-subspace literal expression tree with NEW
    codebook values every iteration, so every iteration paid a full
    whole-stage-codegen recompile (~1.1 s/job measured at sf0.1 —
    12× the actual execution); the kernel keeps centroids/codebooks in
    the task closure, runs the same arithmetic in numpy, and the
    downstream (s, code, dim) → avg plan is literal-free and stable,
    so codegen compiles once.

    BIT-EXACT twin of the SQL form (pinned by
    tests/test_round15_opt.py): every fold is replicated as a
    per-dimension vectorized accumulation — ``acc += x[:,d]*c[d]`` in
    dimension order is exactly the SQL ``aggregate`` left-fold per
    row — argmax/argmin take the FIRST extremum like
    array_position(arr, array_max/min(arr)), NULL vectors contribute
    no rows (the SQL posexplode of a NULL slice array), and the mean
    update stays the SAME JVM groupBy-avg over rows emitted in the
    same per-partition order. The input frame is cached for the
    iterations (scoped: unpersisted before return, so a later
    invocation can never reuse it)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    from scalecast_spark.datapipe.dedup import _spread

    base = (
        df.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .repartition(_spread(df))
    )
    base.cache()
    C = (
        np.array([cv for _, cv in cents], float)
        if cents is not None else None
    )
    out_schema = T.StructType(
        [
            T.StructField("_s", T.IntegerType()),
            T.StructField("_code", T.IntegerType()),
            T.StructField("_dim", T.IntegerType()),
            T.StructField("_x", T.DoubleType()),
        ]
    )
    try:
        for _ in range(n_iter):
            B = [
                np.array([cw for _, cw in books[s]], float)
                for s in range(m)
            ]

            def assign(batches, _B=B):
                for batch in batches:
                    col = batch.column(0)
                    n = len(col)
                    if n == 0:
                        continue
                    V = np.asarray(col.flatten().to_numpy(
                        zero_copy_only=False
                    )).reshape(n, -1)
                    if C is not None:
                        # sequential-fold dot per centroid: acc += V[:,d]*c[d]
                        dots = np.zeros((n, len(C)))
                        for ci in range(len(C)):
                            acc = np.zeros(n)
                            for d in range(V.shape[1]):
                                acc += V[:, d] * C[ci, d]
                            dots[:, ci] = acc
                        cell = np.argmax(dots, axis=1)  # first max, like array_position
                        V = V - C[cell]
                    ss, cc, dd, xx = [], [], [], []
                    for s in range(m):
                        S = V[:, s * sub:(s + 1) * sub]
                        dist = np.zeros((n, ksub))
                        for ci in range(ksub):
                            acc = np.zeros(n)
                            for d in range(sub):
                                t = S[:, d] - _B[s][ci, d]
                                acc += t * t
                            dist[:, ci] = acc
                        code = np.argmin(dist, axis=1) + 1  # 1-based, first min
                        ss.append(np.full(n * sub, s, dtype=np.int32))
                        cc.append(np.repeat(code.astype(np.int32), sub))
                        dd.append(np.tile(np.arange(sub, dtype=np.int32), n))
                        xx.append(S.ravel())
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.concatenate(ss), type=pa.int32()),
                            pa.array(np.concatenate(cc), type=pa.int32()),
                            pa.array(np.concatenate(dd), type=pa.int32()),
                            pa.array(np.concatenate(xx), type=pa.float64()),
                        ],
                        names=["_s", "_code", "_dim", "_x"],
                    )

            rows = (
                base.mapInArrow(assign, out_schema)
                .groupBy("_s", "_code", "_dim")
                .agg(F.avg("_x").alias("_m"))
                .collect()
            )
            upd: dict[tuple[int, int], list[float]] = {}
            for r in rows:
                upd.setdefault((r["_s"], r["_code"]), [0.0] * sub)[
                    r["_dim"]
                ] = r["_m"]
            books = [
                [
                    (code, upd.get((s, code), cw))
                    for code, cw in books[s]
                ]
                for s in range(m)
            ]
    finally:
        base.unpersist()
    return books


def _pq_code_col(sub_col, codebook) -> "F.Column":
    """1-based nearest-codeword index for one subspace by squared L2
    (ties → lowest code, via array_position of the min).

    The codebook enters as ONE literal array-of-arrays scanned by a
    single ``F.transform`` — not ksub expanded fold expressions.
    Identical semantics, ~16x smaller expression tree: with m·ksub
    expanded folds Catalyst planning alone cost ~5 s per query
    (measured; row count had no effect), the collapsed form plans in
    ~1 s."""
    cb = _lit_mat([cv for _, cv in codebook])
    dists = F.transform(
        cb,
        lambda c: F.aggregate(
            F.zip_with(sub_col, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # array_position yields LONG; element_at lookups need INT
    return F.array_position(dists, F.array_min(dists)).cast("int")


def _pq_encode_cols(
    out: DataFrame,
    cents,
    books,
    vec_col: str,
    residual: bool,
) -> DataFrame:
    """Append the PQ encode columns (``_sub{s}`` subvectors, ``_d{s}``
    codeword distance tables, ``_code{s}`` 1-based nearest-codeword
    indices) to a frame that already carries ``_cell``. Shared by
    :func:`ivfpq_topk` (query-side) and :func:`ivfpq_encode`
    (index-/stream-side) so both encode bit-identically.

    Pure stateless projection over literal lookup tables — no shuffle,
    no state — so it applies unchanged to a readStream frame. The
    whole thing is assembled as selectExpr SQL strings (4 py4j calls +
    1 parse), not Column-API chains: the m·ksub fold tree built
    operator-by-operator cost ~1.6 s of driver time per query
    (measured) — string assembly is ~free. Each stage materializes its
    arrays once (subvectors → distance tables → codes) so nothing
    re-evaluates per reference."""
    m = len(books)
    d = len(cents[0][1])
    sub = d // m
    vec_sql = f"cast({vec_col} as array<double>)"
    if residual:
        # subvector = vector slice minus the assigned cell's centroid
        # slice (literal n_cells × sub matrix per subspace)
        csub = [
            _mat_sql([cv[s * sub : (s + 1) * sub] for _, cv in cents])
            for s in range(m)
        ]
        out = out.selectExpr(
            "*",
            *[
                f"zip_with(slice({vec_sql}, {s * sub + 1}, {sub}), "
                f"element_at({csub[s]}, cast(_cell as int)), (a, b) -> a - b) AS _sub{s}"
                for s in range(m)
            ],
        )
    else:
        out = out.selectExpr(
            "*",
            *[
                f"slice({vec_sql}, {s * sub + 1}, {sub}) AS _sub{s}"
                for s in range(m)
            ],
        )
    out = out.selectExpr(
        "*",
        *[
            f"transform({_mat_sql([cv for _, cv in books[s]])}, "
            f"c -> aggregate(zip_with(_sub{s}, c, (a, b) -> (a - b) * (a - b)), "
            f"cast(0.0 as double), (acc, x) -> acc + x)) AS _d{s}"
            for s in range(m)
        ],
    )
    return out.selectExpr(
        "*",
        *[
            f"cast(array_position(_d{s}, array_min(_d{s})) as int) AS _code{s}"
            for s in range(m)
        ],
    )


def ivfpq_encode(
    df: DataFrame,
    cents,
    books,
    vec_col: str = "embedding",
    residual: bool = False,
    cell_col: str = "cell",
    code_col: str = "pq_codes",
) -> DataFrame:
    """PQ-encode a vector frame against a FIXED index (centroids +
    per-subspace codebooks, e.g. from ``artifacts.load_centroids`` /
    ``load_pq_codebooks``): every row gains its IVF ``cell`` (1-based
    argmax-dot, ties → lowest) and its ``pq_codes`` array (m 1-based
    nearest-codeword indices, squared-L2, ties → lowest; the residual
    variant quantizes v − cell_centroid).

    This is the missing index-build half of :func:`ivfpq_topk` made
    first-class: encode the corpus ONCE, persist (id, cell, codes) —
    m bytes/vector at ksub ≤ 256 — and serve queries from the code
    table instead of re-encoding per query. Because the encode is a
    pure stateless projection (literal lookup tables, no shuffle, no
    state), the SAME function applies to a readStream firehose in
    append mode — see ``streaming.ops.ivfpq_encode_stream`` for the
    crawl-increment wiring. Rows with a NULL ``vec_col`` pass through
    with NULL cell/codes (tokenless docs from embed_docs_rowwise).
    """
    import os

    if os.environ.get("SPARK_GRAFT_PQ_ARROW", "1") != "0":
        return _ivfpq_encode_arrow(
            df, cents, books, vec_col, residual, cell_col, code_col
        )
    vec = F.col(vec_col).cast("array<double>")
    out = df.withColumn("_cell", _cell_of(vec, cents))
    out = _pq_encode_cols(out, cents, books, vec_col, residual)
    m = len(books)
    codes = "array(" + ", ".join(f"_code{s}" for s in range(m)) + ")"
    return out.selectExpr(
        *df.columns,
        f"cast(_cell as int) AS {cell_col}",
        f"CASE WHEN _cell IS NOT NULL THEN {codes} END AS {code_col}",
    )


def _ivfpq_encode_arrow(
    df: DataFrame,
    cents,
    books,
    vec_col: str,
    residual: bool,
    cell_col: str,
    code_col: str,
) -> DataFrame:
    """:func:`ivfpq_encode` as ONE Arrow kernel (optimization round 15,
    guide §4.2): same per-row arithmetic as the staged-HOF projection —
    every fold replicated as a per-dimension vectorized accumulation
    (bit-exact: the SQL ``aggregate`` left-fold IS ``acc += ...`` in
    dimension order), argmax/argmin take the first extremum like
    array_position over array_max/min, NULL vectors pass through with
    NULL cell/codes — but the centroid/codebook tables live in the task
    closure instead of literal expression trees, so the plan is small,
    stable, and whole-stage-codegen never recompiles per build. Still a
    pure stateless projection: applies unchanged to readStream frames
    (ivfpq_encode_stream), exactly like the SQL form. Parity pinned by
    tests/test_round15_opt.py and tests/test_ivfpq.py."""
    import pyarrow as pa
    from pyspark.sql import types as T

    m = len(books)
    d = len(cents[0][1])
    sub = d // m
    C = np.array([cv for _, cv in cents], float)
    B = [np.array([cw for _, cw in books[s]], float) for s in range(m)]
    ksub = B[0].shape[0]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(cell_col, T.IntegerType()),
            T.StructField(code_col, T.ArrayType(T.IntegerType())),
        ]
    )
    vec_idx = df.columns.index(vec_col)

    def encode(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(vec_idx)
            valid = np.ones(n, dtype=bool)
            if col.null_count:
                valid = ~np.asarray(col.is_null())
            idx = np.nonzero(valid)[0]
            cell_out = np.full(n, -1, dtype=np.int64)
            codes_out = np.zeros((n, m), dtype=np.int32)
            if len(idx):
                dense = col.take(pa.array(idx)) if len(idx) < n else col
                V = np.asarray(
                    dense.flatten().to_numpy(zero_copy_only=False),
                    dtype=np.float64,
                ).reshape(len(idx), d)
                nv = len(idx)
                dots = np.zeros((nv, len(C)))
                for ci in range(len(C)):
                    acc = np.zeros(nv)
                    for k in range(d):
                        acc += V[:, k] * C[ci, k]
                    dots[:, ci] = acc
                cell = np.argmax(dots, axis=1)  # first max
                R = V - C[cell] if residual else V
                for s in range(m):
                    S = R[:, s * sub:(s + 1) * sub]
                    dist = np.zeros((nv, ksub))
                    for ci in range(ksub):
                        acc = np.zeros(nv)
                        for k in range(sub):
                            t = S[:, k] - B[s][ci, k]
                            acc += t * t
                        dist[:, ci] = acc
                    # first min, 1-based (array_position of array_min)
                    codes_out[idx, s] = np.argmin(dist, axis=1) + 1
                cell_out[idx] = cell + 1
            cell_arr = pa.array(
                [int(c) if c > 0 else None for c in cell_out],
                type=pa.int32(),
            )
            codes_arr = pa.array(
                [
                    [int(x) for x in codes_out[i]] if cell_out[i] > 0
                    else None
                    for i in range(n)
                ],
                type=pa.list_(pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [cell_arr, codes_arr],
                names=list(batch.schema.names) + [cell_col, code_col],
            )

    return df.mapInArrow(encode, out_schema)


def _adc_cosine_sql(
    qv: list[float] | None,
    cents,
    books,
    residual: bool,
    cell_expr: str,
    code_exprs: list[str],
    tdot_exprs: list[str] | None = None,
    qdotc_expr: str | None = None,
    qn_expr: str | None = None,
) -> str:
    """Asymmetric-distance cosine score as ONE SQL expression over a
    row that already carries its IVF cell (``cell_expr``, 1-based int)
    and its m PQ codes (``code_exprs[s]``, 1-based). Shared by
    :func:`ivfpq_topk` (codes as freshly-encoded ``_code{s}`` columns),
    :func:`ivfpq_search` (codes as ``element_at`` into a persisted
    array), and :func:`ivfpq_search_batch` — so every serve path
    scores bit-identically to build-and-query.

    The query-DEPENDENT tables — subspace dots tdot (m × ksub), the
    per-cell q·c offsets, and ‖q‖ — come either from ``qv`` (computed
    driver-side, embedded as literals: the single-query paths) or as
    SQL expressions over per-query-row columns (``tdot_exprs`` /
    ``qdotc_expr`` / ``qn_expr``: the batch path, where each query row
    carries its own tables). The query-INDEPENDENT tables (codeword
    norms² t_n2, centroid norms², centroid-codeword cross dots) are
    always index literals. Either way, scoring a vector is m
    ``element_at`` lookups, pure JVM arithmetic inside codegen.
    ``residual`` adds the per-cell reconstruction terms: q·v̂ = q·c +
    Σ tdot[code], ‖v̂‖² = ‖c‖² + 2·Σ c_sub·cw[code] + Σ ‖cw[code]‖²
    (Jégou et al. 2011 §IV)."""
    m = len(books)
    d = len(cents[0][1])
    sub = d // m
    if tdot_exprs is None:
        tdot_exprs = [
            _vec_sql(
                [
                    sum(qv[s * sub + j] * cv[j] for j in range(sub))
                    for _, cv in books[s]
                ]
            )
            for s in range(m)
        ]
    if qn_expr is None:
        qn_expr = _dlit(float(np.sqrt(sum(x * x for x in qv))))
    t_n2 = [
        [sum(x * x for x in cv) for _, cv in books[s]] for s in range(m)
    ]
    adot_sql = " + ".join(
        f"element_at({tdot_exprs[s]}, {code_exprs[s]})"
        for s in range(m)
    )
    rn2_sql = " + ".join(
        f"element_at({_vec_sql(t_n2[s])}, {code_exprs[s]})"
        for s in range(m)
    )
    if residual:
        # reconstruction v̂ = c + r̂: q·v̂ gains the per-cell offset
        # q·c; ‖v̂‖² gains ‖c‖² and the 2·c·r̂ cross terms (per-cell
        # per-subspace lookup tables)
        if qdotc_expr is None:
            qdotc_expr = _vec_sql(
                [float(np.dot(qv, np.asarray(cv))) for _, cv in cents]
            )
        cn2 = [float(np.dot(cv, cv)) for _, cv in cents]
        cdot = [
            _mat_sql(
                [
                    [
                        sum(
                            cv[s * sub + j] * bw[j]
                            for j in range(sub)
                        )
                        for _, bw in books[s]
                    ]
                    for _, cv in cents
                ]
            )
            for s in range(m)
        ]
        adot_sql = f"element_at({qdotc_expr}, {cell_expr}) + {adot_sql}"
        cross_sql = " + ".join(
            f"element_at(element_at({cdot[s]}, {cell_expr}), {code_exprs[s]})"
            for s in range(m)
        )
        rn2_sql = (
            f"element_at({_vec_sql(cn2)}, {cell_expr}) "
            f"+ 2.0 * ({cross_sql}) + {rn2_sql}"
        )
    return (
        f"round(try_divide(cast(0.0 as double) + {adot_sql}, "
        f"{qn_expr} * sqrt(greatest(cast(0.0 as double) + {rn2_sql}, "
        f"0.0))), 6)"
    )


def ivfpq_search(
    codes_df: DataFrame,
    cents,
    books,
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
    refine: int = 4,
    residual: bool = False,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    code_col: str = "pq_codes",
    vec_col: str | None = None,
) -> DataFrame:
    """Serve-side IVF-PQ search over a PERSISTED code table — the
    missing half of :func:`ivfpq_encode`: the corpus was encoded ONCE
    to (id, cell, pq_codes) and saved (m bytes/vector); each query now
    costs one cell-pruned scan of the code table scored by ADC lookups
    — NO index rebuild, NO re-encode, NO raw-vector read.

    This is the 100 TB serving economics the ivfpq recipe exists for:
    a 1 B × 64-dim float corpus is 256 GB of vectors but 8 GB of codes
    at m=8; Q queries against :func:`ivfpq_topk` pay Q index builds
    (training scans included), against this function they pay Q code-
    table scans of nprobe/n_cells of 8 GB. The parquet reader prunes
    on ``cell`` (partition or min/max pruning when the table is
    written partitioned/sorted by cell), and the score is m
    ``element_at`` lookups into literal arrays inside codegen.

    ``vec_col`` (optional): if the code table kept the raw vectors,
    the top ``k*refine`` ADC candidates are exactly re-ranked by true
    cosine — with the same index this returns BIT-identically what
    :func:`ivfpq_topk` returns (asserted in tests/test_pq_stream.py),
    so the gate's ivfpq hash also certifies this path. Without
    ``vec_col`` the ADC score itself ranks (codes-only deployment);
    column ``adc_sim`` holds the 6dp-rounded approximate cosine.

    ``cents`` / ``books`` / ``residual`` must be the SAME artifacts
    and mode the table was encoded with (persist them next to the
    table via ``artifacts.save_centroids`` / ``save_pq_codebooks``).
    """
    m = len(books)
    qv = [float(x) for x in query]
    ranked = sorted(
        cents, key=lambda c: (-float(np.dot(qv, np.asarray(c[1]))), c[0])
    )
    probe = {ci for ci, _ in ranked[:nprobe]}
    adc_sql = _adc_cosine_sql(
        qv, cents, books, residual,
        cell_expr=f"cast({cell_col} as int)",
        code_exprs=[f"element_at({code_col}, {s + 1})" for s in range(m)],
    )
    out = codes_df.filter(F.col(cell_col).isin(*probe))
    if vec_col is None:
        return (
            out.selectExpr(id_col, f"{adc_sql} AS adc_sim")
            .orderBy(F.desc("adc_sim"), id_col)
            .limit(k)
        )
    cand = (
        out.selectExpr(id_col, vec_col, f"{adc_sql} AS _adc")
        .orderBy(F.desc("_adc"), id_col)
        .limit(k * refine)
    )
    sim = cosine_similarity_col(F.col(vec_col).cast("array<double>"), qv)
    return (
        cand.select(id_col, F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def _batch_qx_inplan(q, cents, books, nprobe, qid_col, m, sub):
    """Legacy batch query-side tables, computed in-plan as
    ``transform``/``aggregate`` folds over literal index matrices.
    Kept as the fallback for degenerate query vectors (NULL / ragged /
    non-finite — their NULL-propagation and NaN-ordering semantics
    belong to SQL) and behind ``SPARK_GRAFT_BATCH_ADC_DRIVER=0``."""
    cents_mat = _mat_sql([cv for _, cv in cents])
    q = q.selectExpr(
        "*",
        f"transform({cents_mat}, c -> aggregate(zip_with(_qv, c, "
        f"(a, b) -> a * b), cast(0.0 as double), (acc, x) -> acc + x)) "
        f"AS _cdots",
        "sqrt(aggregate(_qv, cast(0.0 as double), "
        "(acc, x) -> acc + x * x)) AS _qn",
    )
    # top-nprobe cells by (-dot, cell_id) — array_sort on structs
    # reproduces the driver-side sorted(cents, key=(-dot, id)) order
    q = q.selectExpr(
        "*",
        f"slice(transform(array_sort(transform(_cdots, "
        f"(dd, i) -> struct(-dd AS nd, i + 1 AS ci))), "
        f"s -> s.ci), 1, {nprobe}) AS _probe",
    )
    q = q.selectExpr(
        qid_col, "_qv", "_qn", "_cdots", "_probe",
        *[
            f"transform({_mat_sql([cv for _, cv in books[s]])}, "
            f"c -> aggregate(zip_with(slice(_qv, {s * sub + 1}, {sub}), c, "
            f"(a, b) -> a * b), cast(0.0 as double), (acc, x) -> acc + x)) "
            f"AS _t{s}"
            for s in range(m)
        ],
    )
    return q.selectExpr(
        qid_col, "_qv", "_qn", "_cdots",
        *[f"_t{s}" for s in range(m)],
        "explode(_probe) AS _pcell",
    )


def _batch_qx_driver(q, cents, books, nprobe, qid_col, m, d, sub):
    """Driver-side batch query tables: collect the (broadcast-bounded)
    query set and build each query's ``_qn`` / ``_cdots`` / probe set /
    ``_t{s}`` ADC tables with sequential float64 accumulation in the
    EXACT op order of the SQL ``aggregate`` left-folds they replace
    (``acc = acc + x[j]*c[j]`` in element order, from 0.0) — the same
    fold, so every downstream score is bit-identical. Returns
    ``(qx_rows_df, probed_cells)`` — the exploded (query × probed
    cell) local relation plus the union of probed cells for a static
    partition filter on the code table — or ``None`` when any query
    vector needs SQL's NULL/NaN semantics (caller falls back
    in-plan)."""
    import math

    from pyspark.sql import types as T

    rows = q.collect()
    cvecs = [[float(x) for x in cv] for _, cv in cents]
    bvecs = [
        [[float(x) for x in bw] for _, bw in books[s]] for s in range(m)
    ]
    out = []
    cells: set[int] = set()
    for r in rows:
        qv = r["_qv"]
        if (
            qv is None
            or len(qv) != d
            or any(x is None or not math.isfinite(x) for x in qv)
        ):
            return None
        cdots = []
        for cv in cvecs:
            acc = 0.0
            for j in range(d):
                acc = acc + qv[j] * cv[j]
            cdots.append(acc)
        if any(c != c for c in cdots):  # NaN from overflow: SQL sorts it
            return None
        acc = 0.0
        for x in qv:
            acc = acc + x * x
        qn = math.sqrt(acc)
        probe = [
            ci
            for _, ci in sorted(
                (-cdots[i], i + 1) for i in range(len(cdots))
            )
        ][:nprobe]
        ts = []
        for s in range(m):
            col = []
            for bw in bvecs[s]:
                acc = 0.0
                for j in range(sub):
                    acc = acc + qv[s * sub + j] * bw[j]
                col.append(acc)
            ts.append(col)
        cells.update(probe)
        qid = r[qid_col]
        for pc in probe:
            out.append((qid, qv, qn, cdots, *ts, pc))
    arr = T.ArrayType(T.DoubleType())
    schema = T.StructType(
        [
            q.schema[qid_col],
            T.StructField("_qv", arr),
            T.StructField("_qn", T.DoubleType()),
            T.StructField("_cdots", arr),
            *[T.StructField(f"_t{s}", arr) for s in range(m)],
            T.StructField("_pcell", T.IntegerType(), False),
        ]
    )
    return q.sparkSession.createDataFrame(out, schema), sorted(cells)


def ivfpq_search_batch(
    codes_df: DataFrame,
    queries_df: DataFrame,
    cents,
    books,
    k: int = 10,
    nprobe: int = 2,
    refine: int = 4,
    residual: bool = False,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    code_col: str = "pq_codes",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
    vec_col: str | None = None,
) -> DataFrame:
    """BATCH serve: score a whole frame of queries against the
    persisted code table in ONE job — the throughput shape of real ANN
    serving, where queries arrive thousands at a time and per-query
    driver round-trips (:func:`ivfpq_search` builds its ADC tables and
    probe set driver-side) would dominate.

    Everything the single-query path precomputes on the driver moves
    in-plan, per QUERY ROW, against the literal index tables:
      * centroid dots + top-``nprobe`` probe cells — ``transform`` over
        the literal centroid matrix, ``array_sort`` on (-dot, cell)
        structs (the single-query tie-break), ``slice`` nprobe;
      * the (m × ksub) ADC dot tables — one ``transform`` per subspace
        over the literal codebooks against the query's slice.
    Queries then ``explode`` to (query, probed cell) rows and
    BROADCAST-join the code table on ``cell`` — the big side streams,
    never shuffles, and each code-table row is scored for every query
    probing its cell by m ``element_at`` lookups into the query row's
    own table columns. Per-query top-k is a ``row_number`` window over
    (qid) — the only shuffle, keyed by query, and the rank filter
    compiles to map-side WindowGroupLimit (Spark 3.5+), so each input
    partition ships at most k·refine rows per query, never the full
    candidate set. On a cell-partitioned code table the broadcast side
    also drives DYNAMIC partition pruning: the scan reads only the
    union of probed cells, verified in the physical plan
    (PartitionFilters: ... dynamicpruning#...).

    Scale: |Q| queries × nprobe cells fan the broadcast side to
    |Q|·nprobe rows (tables: m·ksub doubles each) — thousands of
    queries fit in one broadcast comfortably; the code-table scan is
    shared by ALL of them, vs Q separate cell-pruned scans for Q
    single-query calls. With ``vec_col`` the top k·refine per query
    exactly re-rank by true cosine (both arrays in-plan).

    Same ADC arithmetic and 6dp rounding as :func:`ivfpq_search`;
    per-query results match the single-query path (parity-tested in
    tests/test_pq_stream.py). The only representational difference:
    query-side dots here are sequential left-folds while the
    single-query driver path uses numpy dot — identical at 6dp away
    from rounding straddles.

    The query-side tables are computed DRIVER-side by default (r15):
    the query set is collected — bounded by the same contract that
    lets it broadcast at all — and each query's probe set / dot
    tables are built with plain sequential float64 accumulation, the
    exact op order of the SQL ``aggregate`` folds they replace, so
    the scores are bit-identical. What that buys: the per-query
    ``transform``-over-literal-matrix expression trees (centroids +
    m codebooks per query column) vanish from the plan, which both
    shrinks it and makes the broadcast side a plain local relation
    instead of a sub-job; the plan no longer re-embeds the index as
    query-side literals, so whole-stage codegen over the scoring
    stage stays byte-stable across calls. Degenerate query sets (a
    NULL / ragged / non-finite vector, whose NULL-propagation and
    NaN-ordering semantics belong to SQL) fall back to the in-plan
    form, as does ``SPARK_GRAFT_BATCH_ADC_DRIVER=0``."""
    import os

    from pyspark.sql import Window

    m = len(books)
    d = len(cents[0][1])
    sub = d // m
    q = queries_df.selectExpr(
        qid_col, f"cast({qvec_col} as array<double>) AS _qv"
    )
    qx = None
    if os.environ.get("SPARK_GRAFT_BATCH_ADC_DRIVER", "1") != "0":
        built = _batch_qx_driver(
            q, cents, books, nprobe, qid_col, m, d, sub
        )
        if built is not None:
            qx, probed = built
            if probed:
                # static partition pruning: the probe set is known
                # driver-side, so the code-table scan carries a plain
                # `cell IN (...)` PartitionFilter instead of waiting
                # on runtime DPP (redundant with the equi-join on
                # _pcell — results unchanged, scan strictly pruned)
                codes_df = codes_df.filter(
                    F.col(cell_col).isin(probed)
                )
    if qx is None:
        qx = _batch_qx_inplan(q, cents, books, nprobe, qid_col, m, sub)
    adc = _adc_cosine_sql(
        None, cents, books, residual,
        cell_expr=f"cast({cell_col} as int)",
        code_exprs=[f"element_at({code_col}, {s + 1})" for s in range(m)],
        tdot_exprs=[f"_t{s}" for s in range(m)],
        qdotc_expr="_cdots",
        qn_expr="_qn",
    )
    joined = codes_df.join(
        F.broadcast(qx), F.col(cell_col) == F.col("_pcell")
    )
    keep = [qid_col, id_col] + (["_qv", "_qn", vec_col] if vec_col else [])
    scored = joined.selectExpr(*keep, f"{adc} AS _adc")
    w = Window.partitionBy(qid_col).orderBy(F.desc("_adc"), F.col(id_col))
    if vec_col is None:
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(qid_col, id_col, F.col("_adc").alias("adc_sim"))
        )
    cand = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k * refine)
    )
    vec = F.col(vec_col).cast("array<double>")
    sim = F.try_divide(
        F.aggregate(
            F.zip_with(vec, F.col("_qv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        _norm(vec) * F.col("_qn"),
    )
    wr = Window.partitionBy(qid_col).orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        cand.select(
            qid_col, id_col, F.round(sim, 6).alias("cosine_sim")
        )
        .withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    residual: bool = False,
    train_iters: int = 0,
    cents=None,
    books=None,
) -> DataFrame:
    """IVF-PQ ANN (the FAISS IVFPQ recipe): coarse-quantize to
    ``n_cells`` IVF cells, PQ-encode every vector to ``m`` sub-codes
    scan-side, rank the probed cells by ASYMMETRIC DISTANCE
    COMPUTATION — the query precomputes one (m × ksub) lookup table of
    subspace dot products, so scoring a vector is m table lookups
    instead of a d-dim dot product — then exactly re-rank the top
    ``k·refine`` ADC candidates with true cosine.

    Scale shape: the 100 TB win is that the PQ codes are m bytes/vector
    (vs 4d bytes) — at m=8, a 64-dim float corpus compresses 32×, so
    the candidate scan reads codes, not vectors, and the ADC score is
    pure JVM lookup arithmetic (element_at into literal arrays) inside
    codegen. One scan, cell-pruned, two TakeOrderedAndProject heaps
    (k·refine then k); the exact re-rank touches only k·refine rows.

    ``residual=True`` (round 5) closes the gap to the full FAISS
    recipe: codes quantize (v - cell_centroid) with shared residual
    codebooks, and the ADC decomposes q·v̂ = q·c + Σ tdot[code] and
    ‖v̂‖² = ‖c‖² + 2·Σ c_sub·codeword[code] + Σ ‖codeword[code]‖² —
    the extra per-cell terms are (n_cells) / (m × n_cells × ksub)
    literal lookup tables, still pure JVM lookups. The default stays
    NON-residual on purpose: residual coding pays off when the corpus
    is clustered (IVF cells capture real structure — recall ≥ plain,
    tested on a clustered corpus), but on an unclustered corpus the
    centroid-norm + cross terms dominate the reconstruction and
    recall measurably DROPS (5 → 2 of 10 on the near-random test
    fixture, round 6) — a data-dependent trade the caller should opt
    into, not inherit.

    ``train_iters > 0`` (round 6) Lloyd-trains the codebooks from the
    md5-sample init (:func:`pq_codebooks_trained`) — one extra scan
    per iteration at index-build time, better recall at the same code
    budget. Every variant stays deterministic end-to-end (md5 seeds +
    posexplode-avg means + 6dp-rounded ADC ranking with id tie-break);
    the sim_topk family oracle restates the residual+trained
    configuration, unrolling the training iterations in SQL.

    ``cents=`` / ``books=`` (round 8) pass a PREBUILT index through —
    e.g. from ``artifacts.load_centroids`` / ``load_pq_codebooks`` —
    so the (training-scan-heavy) index build is paid once, not once
    per query; ``n_cells`` / ``ksub`` / ``train_iters`` are ignored
    when both are given. For a corpus already PQ-encoded by
    :func:`ivfpq_encode`, skip the encode too: :func:`ivfpq_search`
    serves straight off the (id, cell, codes) table."""
    if cents is None:
        cents = ivf_centroids(df, n_cells, vec_col, id_col)
    if books is None:
        if train_iters > 0:
            books = pq_codebooks_trained(
                df, m, ksub, train_iters, vec_col, id_col,
                cents=cents if residual else None,
            )
        else:
            books = (
                pq_codebooks_residual(df, cents, m, ksub, vec_col, id_col)
                if residual
                else pq_codebooks(df, m, ksub, vec_col, id_col)
            )
    m = len(books)
    d = len(query)
    sub = d // m
    qv = [float(x) for x in query]
    qn = float(np.sqrt(sum(x * x for x in qv)))
    ranked = sorted(
        cents, key=lambda c: (-float(np.dot(qv, np.asarray(c[1]))), c[0])
    )
    probe = {ci for ci, _ in ranked[:nprobe]}
    vec = F.col(vec_col).cast("array<double>")
    out = df.withColumn("_cell", _cell_of(vec, cents)).filter(
        F.col("_cell").isin(*probe)
    )
    out = _pq_encode_cols(out, cents, books, vec_col, residual)
    adc_sql = _adc_cosine_sql(
        qv, cents, books, residual,
        cell_expr="cast(_cell as int)",
        code_exprs=[f"_code{s}" for s in range(m)],
    )
    cand = (
        out.selectExpr(id_col, vec_col, f"{adc_sql} AS _adc")
        .orderBy(F.desc("_adc"), id_col)
        .limit(k * refine)
    )
    sim = cosine_similarity_col(F.col(vec_col).cast("array<double>"), query)
    return (
        cand.select(id_col, F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantizer: str = "sample",
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest (max dot product)
    centroid scan-side, probe the ``nprobe`` cells closest to the
    query, brute-force cosine only within them. Candidate set shrinks
    ~ nprobe/n_cells; assignment is a pure projection (no shuffle) and
    the cell filter prunes before TakeOrderedAndProject.

    ``quantizer='sample'`` (default) uses the md5-sampled centroids —
    deterministic AND SQL-restatable, what the correctness gate
    certifies; ``'kmeans'`` trains the centroids with Lloyd iterations
    first (the FAISS-style production recipe: balanced cells, higher
    per-probe recall) at the cost of n_iter extra passes."""
    import numpy as np

    if quantizer == "kmeans":
        cents = kmeans_ivf_centroids(df, n_cells, vec_col=vec_col, id_col=id_col)
    elif quantizer == "sample":
        cents = ivf_centroids(df, n_cells, vec_col, id_col)
    else:
        raise ValueError(f"quantizer must be sample|kmeans, got {quantizer!r}")
    qv = np.asarray(query, dtype=float)
    ranked = sorted(
        cents, key=lambda c: (-float(np.dot(qv, np.asarray(c[1]))), c[0])
    )
    probe = {ci for ci, _ in ranked[:nprobe]}
    vec = F.col(vec_col).cast("array<double>")
    sim = cosine_similarity_col(vec, query)
    return (
        df.withColumn("_cell", _cell_of(vec, cents))
        .filter(F.col("_cell").isin(*probe))
        .select(id_col, F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


# ------------------------------------------------ serving operations
# The operational tail of the build-once/serve-many ANN story
# (round 9): streaming increments (ivfpq_encode_stream) append small
# files per cell and slowly drift away from the build-time centroids;
# these helpers measure both and fix the first.


def _fs_listing(spark, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path`` via the Hadoop FS
    API — works on any filesystem the cluster mounts, not just local."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(p, True)
    files = size = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue  # _SUCCESS, checksums, hidden
        files += 1
        size += int(st.getLen())
    return files, size


def ivfpq_cell_stats(codes_df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Per-cell occupancy of a code table: (cell, n_rows, share).
    One map-side-combined groupBy — n_cells rows out regardless of
    corpus size. Feeds skew decisions (a hot cell wants more
    files_per_cell at compaction; extreme skew wants centroid
    retraining, see :func:`ivfpq_assign_stats`)."""
    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        codes_df.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / total, 6))
        .orderBy(cell_col)
    )


def ivfpq_compact(
    spark,
    in_path: str,
    out_path: str,
    cell_col: str = "cell",
    files_per_cell: int = 1,
    id_col: str = "vec_id",
) -> dict:
    """Compact a cell-partitioned code table that streaming increments
    have fragmented (every ivfpq_encode_stream micro-batch appends ≥1
    small file per touched cell — after a day of 1-minute triggers a
    cell dir holds ~1440 files and the serve-path scan pays per-file
    open/footer costs that dwarf the data read).

    Rewrites the table with ``files_per_cell`` files per cell
    (repartition on (cell[, salt]) so the shuffle is keyed by cell and
    the writer emits whole files per partition dir; salt splits hot
    cells). Writes to ``out_path`` — versioned paths, NOT in-place:
    Spark cannot safely overwrite its own input, and the serve fleet
    swaps paths atomically the same way index refreshes do
    (ivfpq_encode_stream docstring). Row-count equality is verified
    before returning.

    Returns {files_before, files_after, bytes_before, bytes_after,
    rows} for the operator's log line."""
    if in_path.rstrip("/") == out_path.rstrip("/"):
        raise ValueError(
            "ivfpq_compact: out_path must differ from in_path (Spark "
            "cannot rewrite its own input in place; use versioned paths)"
        )
    df = spark.read.parquet(in_path)
    files_before, bytes_before = _fs_listing(spark, in_path)
    n_in = df.count()
    if files_per_cell <= 1:
        out = df.repartition(F.col(cell_col))
    else:
        out = df.repartition(
            F.col(cell_col),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_cell)),
        )
    out.write.mode("overwrite").partitionBy(cell_col).parquet(out_path)
    compacted = spark.read.parquet(out_path)
    n_out = compacted.count()
    if n_out != n_in:
        raise RuntimeError(
            f"ivfpq_compact: row count changed ({n_in} -> {n_out}); "
            f"output at {out_path!r} is NOT safe to swap in"
        )
    files_after, bytes_after = _fs_listing(spark, out_path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "rows": n_in,
    }


def ivfpq_assign_stats(
    df: DataFrame,
    cents,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assignment-quality stats of a vector frame against FIXED
    centroids: per cell, (n_rows, share, avg_sim, p05_sim) where sim
    is the cosine of each vector to its ASSIGNED centroid. Run once on
    the build corpus (the baseline), then on each increment; falling
    sims mean the increments no longer resemble what the quantizer was
    trained on. Pure projection + one bounded groupBy — n_cells rows
    out at any corpus size."""
    vec = F.col(vec_col).cast("array<double>")
    cb = _lit_mat([cv for _, cv in cents])
    cn = F.array(*[
        F.lit(float(np.sqrt(np.dot(cv, cv)))) for _, cv in cents
    ])
    dots = F.transform(
        cb,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    cell = F.array_position(dots, F.array_max(dots))
    sim = F.try_divide(
        F.array_max(dots), _norm(vec) * F.element_at(cn, cell.cast("int"))
    )
    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        df.select(cell.alias("cell"), sim.alias("_sim"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("_sim"), 6).alias("avg_sim"),
            F.round(F.percentile("_sim", F.lit(0.05)), 6).alias("p05_sim"),
        )
        .withColumn("share", F.round(F.col("n_rows") / total, 6))
        .orderBy("cell")
    )


def ivfpq_drift(baseline: DataFrame, current: DataFrame) -> DataFrame:
    """Join two :func:`ivfpq_assign_stats` frames (build-time baseline
    vs a new increment) into the per-cell drift report: sim deltas and
    occupancy shift. ``d_avg_sim`` persistently below zero across
    cells = the increments sit farther from every centroid than the
    build corpus did → retrain the coarse quantizer and re-encode
    (index refresh is a path swap, same as compaction). Cells present
    on only one side keep NULL deltas rather than dropping — a brand
    new hot cell IS drift signal."""
    b = baseline.select(
        "cell",
        F.col("n_rows").alias("n_base"),
        F.col("share").alias("share_base"),
        F.col("avg_sim").alias("avg_sim_base"),
        F.col("p05_sim").alias("p05_sim_base"),
    )
    c = current.select(
        "cell",
        F.col("n_rows").alias("n_cur"),
        F.col("share").alias("share_cur"),
        F.col("avg_sim").alias("avg_sim_cur"),
        F.col("p05_sim").alias("p05_sim_cur"),
    )
    return (
        b.join(c, "cell", "full_outer")
        .withColumn(
            "d_avg_sim", F.round(F.col("avg_sim_cur") - F.col("avg_sim_base"), 6)
        )
        .withColumn(
            "d_p05_sim", F.round(F.col("p05_sim_cur") - F.col("p05_sim_base"), 6)
        )
        .withColumn(
            "d_share", F.round(F.col("share_cur") - F.col("share_base"), 6)
        )
        .orderBy("cell")
    )


def _cell_listing(fs, jvm, dir_path: str):
    """Sorted (file name, length) pairs of a cell directory's data
    files — the metadata fingerprint used to verify an untouched-cell
    transfer without opening a single parquet page."""
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith((".", "_")):
            continue
        out.append((name, int(st.getLen())))
    return sorted(out)


def ivfpq_delete_ids(
    spark,
    in_path: str,
    out_path: str,
    ids: list,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    move_untouched: bool = False,
) -> dict:
    """Delete vectors by id from a cell-partitioned code table — the
    retraction / right-to-be-forgotten operator every serving index
    needs (a user delete must leave the ANN index, not just the
    corpus). Emits a complete new table at ``out_path`` (versioned
    paths, same swap contract as :func:`ivfpq_compact`).

    100 TB shape — data I/O AND accounting proportional to the DELETE,
    not the table (r10 verdict #4: the previous version paid two
    full-table counts for bookkeeping):

    1. ENUMERATE cells from the partition DIRECTORY listing (one
       FileSystem listStatus — no scan).
    2. LOCATE: one column-pruned scan of (id, cell) with the id set
       broadcast (a retraction batch is small by nature), aggregated
       DISTRIBUTED per id — the driver receives at most one summary
       row per requested id, so a hot duplicated id cannot multiply
       driver memory (ADVICE r10 #3: the raw-row collect could).
       This scan is the only whole-table pass and it reads exactly
       two columns.
    3. REWRITE only the touched cells: the read carries a
       ``cell IN (...)`` partition filter (directory pruning —
       untouched cells are never opened), anti-joins the broadcast
       ids, and writes the surviving rows partitioned by cell.
    4. TRANSFER the untouched cell directories into ``out_path``:
       by default the Hadoop FileSystem copy API — file-level, zero
       decode (server-side copy on object stores). With
       ``move_untouched=True`` and both paths on the SAME filesystem,
       a metadata-only ``rename`` instead (ADVICE r10 #2: local/HDFS
       byte copies are avoidable) — DESTRUCTIVE to ``in_path``, which
       afterwards holds only the touched (pre-delete) cells; use it
       when the old version is being retired in place.
    5. VERIFY: touched-cell row accounting (rows kept must equal
       touched rows minus matched rows — both counts are
       directory-pruned to the touched cells, zero-column/footer
       reads) plus a metadata fingerprint (file names + lengths) of
       every copied untouched cell. Nothing in this step scales with
       table size.

    Requesting ids that don't exist is fine — they count 0. Returns
    {rows_touched_before, rows_touched_after, rows_deleted,
    ids_requested, ids_deleted, cells_total, cells_touched,
    untouched_transfer} — ids_* are DISTINCT-id counts, rows_deleted
    counts matched rows (they differ when an id appears in multiple
    rows, e.g. a re-sent streaming increment that was never
    compacted). Accounting scope is the touched cells: untouched
    cells are transferred file-identically and verified by listing,
    so whole-table counts would only re-measure what the fingerprint
    already proves."""
    if in_path.rstrip("/") == out_path.rstrip("/"):
        raise ValueError(
            "ivfpq_delete_ids: out_path must differ from in_path "
            "(versioned paths; Spark cannot rewrite its own input)"
        )
    ids = sorted({int(i) for i in ids})
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dst_root = jvm.org.apache.hadoop.fs.Path(out_path)
    dst_fs = dst_root.getFileSystem(conf)
    if dst_fs.exists(dst_root):
        # FileUtil.copy into an existing dir would NEST cell dirs and
        # the append-write would merge stale rows — fail before work
        raise FileExistsError(
            f"ivfpq_delete_ids: out_path {out_path!r} already exists; "
            f"use a fresh versioned path"
        )
    src_root = jvm.org.apache.hadoop.fs.Path(in_path)
    src_fs = src_root.getFileSystem(conf)
    # cell inventory from the partition directory names — metadata only
    all_cells = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in src_fs.listStatus(src_root)
        if st.isDirectory()
        and st.getPath().getName().startswith(f"{cell_col}=")
    )
    table = spark.read.parquet(in_path)
    id_df = spark.createDataFrame([(i,) for i in ids], f"{id_col} long")
    # LOCATE, aggregated executor-side: <=1 row per requested id
    per_id = (
        table.select(id_col, cell_col)
        .join(F.broadcast(id_df), id_col)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.collect_set(cell_col).alias("cells"),
        )
        .collect()
    )
    rows_del = sum(int(r["n_rows"]) for r in per_id)
    ids_del = len(per_id)
    touched = sorted({int(c) for r in per_id for c in r["cells"]})

    dst_fs.mkdirs(dst_root)
    rows_touched_before = 0
    if touched:
        in_touched = table.filter(F.col(cell_col).isin(touched))
        # zero-column count over the touched cells only (pruned scan,
        # parquet answers it from row-group metadata)
        rows_touched_before = in_touched.count()
        kept = in_touched.join(F.broadcast(id_df), id_col, "left_anti")
        kept.repartition(F.col(cell_col)).write.mode("append").partitionBy(
            cell_col
        ).parquet(out_path)
    same_fs = str(src_fs.getUri()) == str(dst_fs.getUri())
    use_rename = move_untouched and same_fs
    for cell in all_cells:
        if cell in touched:
            continue
        src = jvm.org.apache.hadoop.fs.Path(f"{in_path}/{cell_col}={cell}")
        dst = jvm.org.apache.hadoop.fs.Path(f"{out_path}/{cell_col}={cell}")
        if use_rename:
            if not src_fs.rename(src, dst):
                raise RuntimeError(
                    f"ivfpq_delete_ids: rename of untouched cell dir "
                    f"{str(src)!r} failed; table at {out_path!r} is "
                    f"INCOMPLETE — do not swap it in"
                )
            continue
        before = _cell_listing(src_fs, jvm, str(src))
        # src and dst may live on DIFFERENT filesystems (hdfs -> s3a
        # index promotion) — resolve each side's FS from its own path
        if not jvm.org.apache.hadoop.fs.FileUtil.copy(
            src_fs, src, dst_fs, dst, False, conf
        ):
            raise RuntimeError(
                f"ivfpq_delete_ids: failed to transfer untouched cell "
                f"dir {str(src)!r}"
            )
        after = _cell_listing(dst_fs, jvm, str(dst))
        if before != after:
            raise RuntimeError(
                f"ivfpq_delete_ids: untouched cell {cell} transferred "
                f"with a different file listing ({before} -> {after}); "
                f"output at {out_path!r} is NOT safe to swap in"
            )
    rows_touched_after = 0
    if touched:
        rows_touched_after = (
            spark.read.parquet(out_path)
            .filter(F.col(cell_col).isin(touched))
            .count()
        )
    if rows_touched_after != rows_touched_before - rows_del:
        raise RuntimeError(
            f"ivfpq_delete_ids: touched-cell row accounting failed "
            f"({rows_touched_before} - {rows_del} != "
            f"{rows_touched_after}); output at {out_path!r} is NOT "
            f"safe to swap in"
        )
    return {
        "rows_touched_before": rows_touched_before,
        "rows_touched_after": rows_touched_after,
        "rows_deleted": rows_del,
        "ids_requested": len(ids),
        "ids_deleted": ids_del,
        "cells_total": len(all_cells),
        "cells_touched": len(touched),
        "untouched_transfer": "rename" if use_rename else "copy",
    }
