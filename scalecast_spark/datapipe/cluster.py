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
) -> DataFrame:
    """Lloyd's k-means: returns (id, cluster, sqdist) for every vector.

    ``cluster`` is 1-based (matching the md5-ordered seed order).
    Empty clusters keep their previous centroid. n_iter is small and
    fixed — each iteration costs one scan + one k*d aggregate.
    """
    vec = F.col(vec_col).cast("array<double>")
    cents = ivf_centroids(df, k, vec_col, id_col)
    dim = len(cents[0][1])
    for _ in range(n_iter):
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
    cluster, d = _assign(vec, cents)
    return df.select(
        id_col,
        cluster.alias("cluster"),
        F.round(d, 6).alias("sqdist"),
    )


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
