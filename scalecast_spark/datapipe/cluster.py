"""Distributed k-means over embedding columns — corpus clustering for
training-data curation (topic balancing, stratified sampling, IVF
coarse quantizers).

Physical shape (the standard Lloyd layout, same as MLlib's):
  * assignment is a scan-side PROJECTION against the k broadcast
    centroids (no shuffle);
  * the mean update is one groupBy over (cluster, dimension) — a
    k*d-cell aggregate, shuffle bounded by k*d not by n;
  * only the k x d centroid matrix ever reaches the driver, once per
    iteration.

Determinism: centroids initialize from the md5-ordered vector sample
(similarity.ivf_centroids) and every Lloyd step is
argmin/avg arithmetic, so the WHOLE clustering — n_iter iterations
deep — replays in SQL and hash-matches the DuckDB oracle (the same
technique as the STL/LOESS unroll).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scalecast_spark.datapipe.similarity import ivf_centroids


def _sqdist(vec, cent: list[float]) -> "F.Column":
    clit = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec, clit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vec, cents: list[tuple[int, list[float]]]):
    """(cluster, sqdist) of the nearest centroid; ties -> lowest id."""
    dists = F.array(*[_sqdist(vec, cv) for _, cv in cents])
    best = F.array_min(dists)
    cluster = F.array_position(dists, best).cast("int")
    return cluster, best


def kmeans_embeddings(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool | None = None,
    vectorized_threshold: int = 4096,
) -> DataFrame:
    """Lloyd's k-means: returns (id, cluster, sqdist) for every vector.

    ``cluster`` is 1-based (matching the md5-ordered seed order).
    Empty clusters keep their previous centroid. n_iter is small and
    fixed — each iteration costs one scan + one k*d aggregate.

    ``vectorized=None`` auto-selects the physical assignment strategy:
    below ``vectorized_threshold`` k*d cells the interpreted
    column-expression argmin runs (its arithmetic order matches the SQL
    oracle bit-for-bit); at or above it each iteration switches to one
    numpy GEMM per Arrow batch (``assign_clusters_vectorized`` for the
    final pass, per-batch partial (cluster, dim) sums for the mean
    update — the n*d posexplode disappears entirely). Same argmin
    semantics either way (ties → lowest cell; parity-tested).
    """
    vec = F.col(vec_col).cast("array<double>")
    cents = ivf_centroids(df, k, vec_col, id_col)
    dim = len(cents[0][1])
    if vectorized is None:
        vectorized = k * dim >= vectorized_threshold
    for _ in range(n_iter):
        if vectorized:
            means = (
                _partial_cluster_sums(df, cents, vec_col)
                .groupBy("_c", "_dim")
                .agg((F.sum("_s") / F.sum("_n")).alias("_m"))
                .collect()
            )
        else:
            cluster, _d = _assign(vec, cents)
            assigned = df.withColumn("_c", cluster)
            means = (
                assigned.select("_c", F.posexplode(vec).alias("_dim", "_x"))
                .groupBy("_c", "_dim")
                .agg(F.avg("_x").alias("_m"))
                .collect()
            )
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(r["_c"], [0.0] * dim)[r["_dim"]] = r["_m"]
        cents = [
            (ci, by_cell.get(ci, cv)) for ci, cv in cents
        ]
    if vectorized:
        return assign_clusters_vectorized(df, cents, vec_col, id_col)
    cluster, d = _assign(vec, cents)
    return df.select(
        id_col,
        cluster.alias("cluster"),
        F.round(d, 6).alias("sqdist"),
    )


def _partial_cluster_sums(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str,
) -> DataFrame:
    """GEMM assignment + per-batch partial (cluster, dim, sum, count)
    rows for the Lloyd mean update. Each Arrow batch emits at most k*d
    rows regardless of batch size, so the shuffle that follows is
    bounded by k*d*n_batches — the map-side-combine shape — instead of
    the expression path's n*d posexplode."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray([cv for _, cv in cents], dtype=float)  # (k, d)
    ids = np.asarray([ci for ci, _ in cents])
    k, d = C.shape
    cn = (C * C).sum(axis=1)
    schema = T.StructType(
        [
            T.StructField("_c", T.IntegerType()),
            T.StructField("_dim", T.IntegerType()),
            T.StructField("_s", T.DoubleType()),
            T.StructField("_n", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            V = np.asarray([np.asarray(v, dtype=float) for v in pdf[vec_col]])
            if len(V) == 0:
                continue
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + cn[None, :]
            best = d2.argmin(axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, best, V)
            counts = np.bincount(best, minlength=k)
            nz = counts > 0
            cell = np.repeat(ids[nz], d)
            yield pd.DataFrame(
                {
                    "_c": cell.astype("int32"),
                    "_dim": np.tile(np.arange(d, dtype="int32"), int(nz.sum())),
                    "_s": sums[nz].ravel(),
                    "_n": np.repeat(counts[nz], d).astype("int64"),
                }
            )

    return df.select(vec_col).mapInPandas(run, schema)


def assign_clusters_vectorized(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Performance twin of the expression-based assignment: one numpy
    GEMM per Arrow batch (||v-c||² = ||v||² - 2 v·C + ||c||²) via
    mapInPandas. Same argmin semantics (ties → lowest cell). Prefer
    this for wide embeddings / large k, where the k × d interpreted
    higher-order-function expressions dominate; the expression variant
    stays the default because its arithmetic order matches the SQL
    oracle bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray([cv for _, cv in cents], dtype=float)  # (k, d)
    ids = [ci for ci, _ in cents]
    cn = (C * C).sum(axis=1)
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("cluster", T.IntegerType()),
            T.StructField("sqdist", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            V = np.asarray(
                [np.asarray(v, dtype=float) for v in pdf[vec_col]]
            )
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + cn[None, :]
            best = d2.argmin(axis=1)  # first minimum → lowest cell
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": [ids[b] for b in best],
                    "sqdist": np.round(d2[np.arange(len(best)), best], 6),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def balance_by_cluster(
    df: DataFrame,
    k: int = 8,
    per_cluster: int = 50,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **kmeans_kw,
) -> DataFrame:
    """Topic-balanced corpus selection: cluster the embedding space
    with deterministic k-means, then keep at most ``per_cluster``
    vectors per cluster (md5-ranked, via sample.cap_per_group) — the
    standard recipe for rebalancing a crawl corpus whose topic mix is
    dominated by a few giant modes. Output (id, cluster) for joining
    back to the documents. Fully deterministic end-to-end, so the
    whole select replays in SQL."""
    from scalecast_spark.datapipe.sample import cap_per_group

    assigned = kmeans_embeddings(
        df, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col, **kmeans_kw
    ).select(id_col, "cluster")
    return cap_per_group(assigned, "cluster", per_cluster, id_col, salt="balance")
