"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Each query materializes fully via the noop sink (no driver collect
bottleneck, no disk write — pure compute + shuffle measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402

HEADLINE = [
    "flagship_daily_revenue",
    "tpch_q1_pricing",
    "ts_metrics",
    "ts_forecast_recursive",
    "ts_cv_grid",
    "ts_sessionize",
    "ts_impute_linear",
    "dedup_exact",
    "dedup_minhash_sigs",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "text_quality",
    "text_lang_id",
    "text_tfidf",
    "docs_sample",
    "sim_cosine_topk",
    "emb_norms",
    "emb_kmeans",
    "ts_stl",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scalecast_spark import get_session

    spark = get_session("bench")
    # warm-up: pay one-time Hadoop/codegen init outside the timers
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    qs = entrymod.queries()
    times: dict[str, float] = {}
    t0 = time.time()
    for name in HEADLINE:
        start = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - start, 3)
    total = round(time.time() - t0, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
