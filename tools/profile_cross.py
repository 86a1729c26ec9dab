"""Stage-level profile of cross_dedup at two corpus scales (r12
verdict #3: dedup_cross grew 3.9x/2.1x at 10x data — find which stage
grows and whether candidate volume is dup-rate-bound).

Usage: python tools/profile_cross.py [sf_dir] [sf1_dir]
Prints one line per (scale, stage): wall seconds + the stage's row
counts (signatures, band buckets, candidate pairs, verified matches,
survivors).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scalecast_spark import get_session  # noqa: E402
from scalecast_spark.datapipe.dedup import (  # noqa: E402
    _band_buckets, cross_dedup, minhash_signatures, word_shingles,
)


def profile(spark, sf_dir, tag):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 3 == 0).cache()
    old = docs.filter(F.col("doc_id") % 3 != 0).cache()
    n_new, n_old = new.count(), old.count()

    def sigs(df):
        return minhash_signatures(
            word_shingles(df, 3), n_hashes=4
        ).select("doc_id", *[f"minhash_{i}" for i in range(4)])

    t0 = time.time()
    new_sigs = sigs(new).cache()
    ns = new_sigs.count()
    t_sig_new = time.time() - t0
    t0 = time.time()
    ex_sigs = sigs(old).cache()
    es = ex_sigs.count()
    t_sig_old = time.time() - t0

    t0 = time.time()
    a = F.broadcast(_band_buckets(new_sigs, 4, "doc_id")).alias("a")
    b = _band_buckets(ex_sigs, 4, "doc_id").alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct()
    ).cache()
    nc = cands.count()
    t_cand = time.time() - t0

    # candidate fan-out distribution per new doc
    dist = (
        cands.groupBy("id_a").count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("av"),
             F.expr("percentile(count, 0.99)").alias("p99"))
        .collect()[0]
    )

    t0 = time.time()
    surv = cross_dedup(
        new, old, k=3, n_hashes=4, bands=4, min_jaccard=0.5
    ).count()
    t_full = time.time() - t0

    mx = dist["mx"] if dist["mx"] is not None else 0
    p99 = dist["p99"] if dist["p99"] is not None else 0.0
    av = dist["av"] if dist["av"] is not None else 0.0
    print(
        f"{tag}: new={n_new} old={n_old} | sig_new={t_sig_new:.2f}s "
        f"sig_old={t_sig_old:.2f}s cand={t_cand:.2f}s full={t_full:.2f}s | "
        f"cands={nc} ({nc / max(n_new, 1):.2f}/new, max={mx}, "
        f"p99={p99:.0f}, avg={av:.2f}) survivors={surv}"
    )
    for d in (new, old, new_sigs, ex_sigs, cands):
        d.unpersist()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_bench_sf0.1"
    spark = get_session("profile-cross")
    profile(spark, sf, "sf0.1")
    if os.path.isdir(sf1):
        profile(spark, sf1, "sf1")
        profile(spark, sf1, "sf1-warm")


if __name__ == "__main__":
    main()
