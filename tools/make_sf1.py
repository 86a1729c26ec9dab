"""Materialize an sf1-scale corpus (~10x sf0.1) for the bench's scale
tier (r11 verdict #6: the 100 TB story rested on in-plan 16x replica
probes; this gives the bench a REAL bigger corpus read from disk, so
super-linear blowups surface as wall-clock before a cluster finds
them).

Replication semantics (mirrors tools/scale_probe.py's mutate axis —
the realistic one):

  * documents — 10 replicas, id-offset; replicas 1..9 alphabet-rotated
    so cross-replica shingle overlap is zero: the near-dup RATE stays
    the sf0.1 rate while candidate volume grows linearly (an exact
    replica would turn every doc into a 10-clique and measure a
    different operator).
  * embeddings — id-offset + per-replica dimension rotation: norms,
    within-replica dots, and cluster structure preserved; cross-replica
    cosines unstructured, so near-dup volume grows linearly.
  * events — user_id-offset replicas (same days, 10x the per-day
    volume): daily aggregates get 10x heavier without changing the
    series count or calendar, which is exactly how a bigger tenant
    looks.
  * tpch + region/nation dims — copied verbatim (the sf1 tier's 8
    queries don't read them, but a complete directory keeps every
    q_* callable runnable against it).

Usage: python tools/make_sf1.py [out_dir] [src_sf_dir]
Defaults: /tmp/sf1_bench from /root/testdata/sf0.1
Idempotent: skips tables whose parquet already exists with a _SUCCESS.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FACTOR = 10
ALPHA = "abcdefghijklmnopqrstuvwxyz"
#: id headroom between replicas (> any sf0.1 id)
OFFSET = 10_000_000


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_documents(docs):
    parts = []
    for i in range(FACTOR):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
        if i > 0:
            rot = ALPHA[i % 25 + 1:] + ALPHA[: i % 25 + 1]
            p = p.withColumn("text", F.translate("text", ALPHA, rot))
        parts.append(p)
    return _union(parts)


def replicate_embeddings(emb, dim=64):
    parts = []
    for i in range(FACTOR):
        p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET))
        if i > 0:
            k = (i * 7) % (dim - 1) + 1
            p = p.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", k + 1, dim - k),
                    F.slice("embedding", 1, k),
                ),
            )
        parts.append(p)
    return _union(parts)


def replicate_events(ev):
    parts = []
    for i in range(FACTOR):
        parts.append(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * OFFSET))
            .withColumn("event_id", F.col("event_id") + F.lit(i * OFFSET))
        )
    return _union(parts)


def build(out: str, src: str, spark=None) -> str:
    if spark is None:
        from scalecast_spark import get_session

        spark = get_session("make-sf1")
    os.makedirs(out, exist_ok=True)

    def done(name):
        return os.path.exists(f"{out}/{name}.parquet/_SUCCESS")

    from scalecast_spark.sources import load_table

    if not done("documents"):
        replicate_documents(
            spark.read.parquet(f"{src}/documents.parquet")
        ).repartition(32).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )
    if not done("embeddings"):
        emb = spark.read.parquet(f"{src}/embeddings.parquet")
        dim = len(emb.select("embedding").first()[0])
        replicate_embeddings(emb, dim=dim).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{out}/embeddings.parquet")
    if not done("events"):
        # load_table normalizes the ts physical type (nanos-as-long),
        # so the sf1 copy is plain TIMESTAMP regardless of generation
        replicate_events(load_table(spark, src, "events")).repartition(
            32
        ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        if not done(t):
            spark.read.parquet(f"{src}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(f"{out}/{t}.parquet")
    return out


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_bench"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    build(out, src)
    print(f"sf1 corpus at {out} (10x {src})")


if __name__ == "__main__":
    main()
