"""Multi-tenant width probe for the kernel-CV task split (round-14
verdict #7).

Round 13 split run_kernel_cv's tasks across (series × fold ×
cell-chunk) so FEW-series workloads fill the cluster; the open
question was the MANY-series regime: does the ≥cores-series path keep
replication factor exactly 1 (no shuffle bytes spent on idle-compute
insurance), and does wall-clock track TOTAL ROWS rather than series
count?

This probe runs Forecaster.cross_validate (the real caller — it
computes and forwards n_series) over synthetic corpora that hold
TOTAL rows ~constant while series count sweeps 5 → 10,000, then reads
back models.kernel.LAST_CV_SPLIT (the r14 observability hook for the
split decision).

PASS criteria:
  * replication == 1 for every config with n_series >= cores;
  * replication > 1 only in the few-series regime;
  * wall-clock across the equal-row configs stays within a small
    band (series-count overhead is sub-linear), and the 2x-rows
    config costs ~2x, not more.

Usage: python tools/cv_width_probe.py  (no args; ~2-4 min)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalecast_spark import Forecaster, get_session  # noqa: E402
from scalecast_spark.frame import DS, SERIES, Y  # noqa: E402
from scalecast_spark.models import kernel  # noqa: E402


def synth(spark, n_series: int, length: int, seed: int = 11):
    """n_series daily series of `length` rows — generated DISTRIBUTED
    (range + expressions), so the 10k-series corpus never
    materializes driver-side."""
    from pyspark.sql import functions as F

    base = spark.range(n_series * length).select(
        F.concat(F.lit("s"), (F.col("id") % n_series)).alias(SERIES),
        (F.col("id") / n_series).cast("long").alias("_t"),
    )
    df = base.select(
        SERIES,
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2020-01-01 00:00:00"))
            + F.col("_t") * 86400
        ).alias(DS),
        (
            50.0
            + 0.1 * F.col("_t")
            + 5.0 * F.sin(F.col("_t") / 7.0)
            + (F.hash(SERIES, "_t", F.lit(seed)) % 1000) / 250.0
        ).alias(Y),
    )
    return df


def run_config(spark, n_series: int, length: int) -> dict:
    df = synth(spark, n_series, length)
    f = Forecaster(df)
    f.set_validation_length(7)
    f.set_estimator("ridge")
    f.ingest_grid({"alpha": [0.1, 1.0]})
    f.add_ar_terms(2)
    t0 = time.time()
    f.cross_validate(k=3)  # test_length auto: usable//(k+1), scales with series length
    wall = time.time() - t0
    split = dict(kernel.LAST_CV_SPLIT or {})
    return {
        "n_series": n_series,
        "rows": n_series * length,
        "wall": round(wall, 2),
        "replication": split.get("replication"),
        "fold_split": split.get("fold_split"),
        "chunk_count": split.get("chunk_count"),
        "best": f.best_params,
    }


def main():
    spark = get_session("cv_width_probe")
    cores = spark.sparkContext.defaultParallelism
    configs = [
        (5, 2000),        # few-series regime: split must widen
        (1000, 240),      # 240k rows across 1000 series
        (10000, 24),      # same 240k rows across 10000 series
        (10000, 48),      # 2x rows, same series count
    ]
    print(f"cores={cores}")
    print(f"{'series':>7} {'rows':>9} {'wall_s':>7} {'repl':>5} "
          f"{'fold':>5} {'chunk':>5}")
    results = []
    ok = True
    for s, ln in configs:
        r = run_config(spark, s, ln)
        results.append(r)
        print(f"{r['n_series']:>7} {r['rows']:>9} {r['wall']:>7} "
              f"{r['replication']:>5} {str(r['fold_split']):>5} "
              f"{r['chunk_count']:>5}", flush=True)
        if s >= cores and r["replication"] != 1:
            print(f"  FAIL: {s} series >= {cores} cores but "
                  f"replication={r['replication']} (must be 1)")
            ok = False
        if s < cores and r["replication"] == 1 and cores > 3:
            print(f"  FAIL: {s} series under {cores} cores kept "
                  "replication 1 — the r13 split regressed")
            ok = False
    # equal-rows pair: series-count overhead must be sub-linear — 10x
    # the series at the same rows may cost more (10x the numpy fits'
    # fixed overhead) but nowhere near 10x
    eq = [r for r in results if r["rows"] == results[1]["rows"]]
    if len(eq) == 2 and eq[0]["wall"] > 0:
        ratio = eq[1]["wall"] / eq[0]["wall"]
        print(f"10x-series same-rows wall ratio: {ratio:.2f}")
        if ratio > 5:
            print("  FAIL: series-count overhead super-linear")
            ok = False
    dbl = results[3]["wall"] / max(results[2]["wall"], 1e-9)
    print(f"2x-rows same-series wall ratio: {dbl:.2f}")
    print("PROBE " + ("PASSED" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
