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

# bench names are stable across rounds for BASELINE comparability, so
# each maps straight to its q_* implementation (queries() keys changed
# in round 3 when operator families were merged for the driver's
# ~50-query correctness cap).
HEADLINE = {
    "flagship_daily_revenue": "q_flagship_daily_revenue",
    "tpch_q1_pricing": "q_tpch_q1_pricing",
    "ts_metrics": "q_ts_metrics",
    "ts_forecast_recursive": "q_ts_forecast_recursive",
    "ts_cv_grid": "q_ts_cv_grid",
    "ts_sessionize": "q_ts_sessionize",
    "ts_impute_linear": "q_ts_impute_linear",
    # round 9: the GATE's dedup_exact became a 2-member family (exact
    # + cross-corpus survivors); the bench keeps timing the standalone
    # exact keep-list so the r1-comparable series is unbroken, and the
    # new incremental member gets its own line item below
    "dedup_exact": "q_dedup_exact_keep",
    "dedup_cross": "q_dedup_cross_bench",
    "dedup_minhash_sigs": "q_dedup_minhash_sigs",
    "dedup_jaccard_pairs": "q_dedup_jaccard_pairs",
    # round 11: the GATE's dedup_simhash gained the n_near member
    # (banded Hamming pigeonhole); the bench keeps timing the
    # fingerprints alone for the r1 series and the pair join gets its
    # own line below
    "dedup_simhash": "q_dedup_simhash_base",
    "dedup_hamming_pairs": "q_dedup_hamming_pairs",
    "text_quality": "q_text_quality",
    "text_lang_id": "q_text_lang_id",
    "text_tfidf": "q_text_tfidf",
    # round 11: the GATE's text_curation gained the decontam-cut
    # member; the bench keeps the pre-r11 composition for the series
    # and times the cut on its own line below
    "text_curation": "q_text_curation_base",
    "text_decontam_cut": "q_text_decontam_cut",
    # round 11: the GATE's text_analysis gained the ExactSubstr
    # dedup-cut member; the bench keeps timing the round-1-comparable
    # composition (same split convention as dedup_exact) and the cut
    # gets its own line below
    "text_signals": "q_text_signals_bench",
    "text_c4": "q_text_c4",
    "docs_sample": "q_docs_sample_strat",
    "corpus_select": "q_docs_sample",
    "sim_cosine_topk": "q_sim_cosine_topk",
    # round 8: the ivfpq line item split into its two real phases —
    # build (train + encode + persist, forced fresh each run) and
    # serve (ADC search over the persisted code table, no rebuild).
    # Bench order guarantees build runs first so serve's cache hit is
    # the deployment shape, not an accident.
    "sim_ivfpq_build": "q_sim_ivfpq_build",
    "sim_ivfpq_serve": "q_sim_ivfpq_serve",
    "sim_ivfpq_serve_batch": "q_sim_ivfpq_serve_batch",
    "emb_norms": "q_emb_norms",
    "emb_kmeans": "q_emb_kmeans",
    "emb_hashdoc": "q_emb_hashdoc_pairs",
    "ts_stl": "q_ts_stl",
    "ts_correlogram": "q_ts_periodogram",
    # round 11 (r10 verdict #8): the reference-shaped Forecaster
    # workload — tune_test_forecast over 3 estimators x 2-cell grids
    # (BASELINE.md parity shape) — so Forecaster-surface regressions
    # are visible in the bench, not only query-shaped paths
    "forecaster_ttf": "q_forecaster_ttf",
    # round 11: the ExactSubstr dedup ACTION (duplicate-span cut with
    # keep-first survivors) — detection + surgery, hash-gated via the
    # text_analysis dedup_fp member
    "text_dedup_cut": "q_text_dedup_cut",
    # round 11: quality-classifier scan-side scoring (fixed literal
    # weights, md5 bucket mode) — hash-gated via the text_analysis
    # q_model_score member; its own line keeps text_signals r1-stable
    "text_qmodel": "q_text_qmodel",
}

# the round-1 query set — the BASELINE.md comparison basis. Queries
# added in later rounds inflate `value`; `common_value` sums only these
# so the ≤2×-of-BENCH_r01 gate stays apples-to-apples as the suite
# accretes.
COMMON = [
    "flagship_daily_revenue",
    "tpch_q1_pricing",
    "ts_metrics",
    "ts_forecast_recursive",
    "ts_sessionize",
    "ts_impute_linear",
    "dedup_exact",
    "dedup_minhash_sigs",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "text_quality",
    "text_lang_id",
    "sim_cosine_topk",
    "emb_norms",
]

# round 12: the SCALE tier — the 8 most expensive suite lines re-run
# once against a materialized ~10x corpus (tools/make_sf1.py), so
# super-linear blowups show up as wall-clock here before a cluster
# would find them. Single pass by design: this tier watches the
# GROWTH RATE (sf1 time / sf0.1 min), not the absolute floor the
# min-of-3 protocol estimates; a separate JSON key keeps the gate's
# r1-comparable series untouched.
SF1_QUERIES = [
    "text_curation",
    "text_signals",
    "forecaster_ttf",
    "corpus_select",
    "sim_ivfpq_build",
    "dedup_cross",
    "dedup_hamming_pairs",
    "dedup_simhash",
]


def _settle_load(threshold: float = 6.0, timeout: float = 180.0) -> float:
    """Wait (bounded) for the 1-min load average to drain below
    `threshold` before a timing section starts. The r13 round artifact
    was stitched from two runs because the sf1 tier always started
    while load1 was still decaying from the suite's own passes; a
    bounded settle keeps suite + tier in ONE uncontended artifact.
    Returns the load observed when the wait ended."""
    if os.environ.get("SPARK_GRAFT_SETTLE", "1") == "0":
        return round(os.getloadavg()[0], 2)
    deadline = time.time() + timeout
    load = os.getloadavg()[0]
    while load > threshold and time.time() < deadline:
        time.sleep(5)
        load = os.getloadavg()[0]
    return round(load, 2)


def _run_sf1_tier(spark) -> dict:
    """Build (or reuse) the sf1 corpus and time SF1_QUERIES once.
    Never fails the bench: any error is reported inside the tier."""
    if os.environ.get("SPARK_GRAFT_SF1", "1") == "0":
        return {"skipped": True}
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default dir is keyed by the SOURCE corpus, so an sf0.01 quick
    # loop never reuses (or pollutes) the sf0.1-derived corpus
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        f"/tmp/sf1_bench_{os.path.basename(src.rstrip('/'))}",
    )
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import make_sf1

        t0 = time.time()
        make_sf1.build(sf1_dir, src, spark=spark)
        build_sec = round(time.time() - t0, 3)
        # the corpus build itself spikes load1; let it decay so the
        # tier's ratios are growth-rate readings, not host weather
        settle_load = _settle_load()
        t0 = time.time()  # the wall budget covers timed queries only
        # soft wall budget: a contended host must never let the scale
        # tier sink the whole bench artifact — stop between queries
        # once over budget and report what ran
        budget = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET", "300"))
        times: dict[str, float] = {}
        loads: dict[str, float] = {}
        truncated = None
        for name in SF1_QUERIES:
            if time.time() - t0 > budget:
                truncated = name
                break
            fn = getattr(entrymod, HEADLINE[name])
            start = time.time()
            fn(spark, sf1_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.time() - start, 3)
            loads[name] = round(os.getloadavg()[0], 2)
        out = {
            "dir": sf1_dir,
            "factor_vs_suite_sf": 10,
            "corpus_build_sec": build_sec,
            "settle_load": settle_load,
            "queries": times,
            "value": round(sum(times.values()), 3),
            "load1_per_query": loads,
            # contention = EXTERNAL load. The per-query load1 readings
            # are sampled right after each tier query's own 32-thread
            # stages finish, so they read 10-15 on a healthy quiet box
            # (self-load, not contention — the r13 mistake that marked
            # every tier hot). The external baseline is the post-settle
            # reading taken while NOTHING of ours runs: the tier is
            # contended iff the settle wait timed out above threshold.
            "contended": settle_load > 6,
        }
        if truncated:
            out["truncated_at"] = truncated
        return out
    except Exception as e:  # the scale tier must never sink the gate
        return {"error": f"{type(e).__name__}: {e}"}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from scalecast_spark import get_session

    spark = get_session("bench")
    # warm-up: pay one-time Hadoop/codegen init outside the timers
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # min of 3 runs per query (2 through round 7): this host shows up
    # to ~5x run-to-run jitter on IDENTICAL plans from EXTERNAL load
    # (same jobs/tasks, no GC, no steal — measured in SCALE.md "Bench
    # noise"; a round-8 contended run put 19.7 s on dedup_simhash's
    # usual ~2 s on BOTH tries of a min-of-2). The min is reproducible
    # and can't flatter a query below its true plan cost; extra tries
    # only shrink the chance a contention burst spans every sample.
    # round 9: the 3 tries are INTERLEAVED (3 passes over the whole
    # suite) instead of consecutive — an external-load burst a few
    # minutes long used to span all 3 back-to-back tries of one query
    # and poison its min (the r8 drift); spread across the run, a
    # burst now costs at most one try per query. Codegen and page
    # caches persist across the passes (same JVM), so warm-run
    # economics are unchanged — still a min-of-3 per query.
    times: dict[str, float] = {}
    loads: dict[str, float] = {}
    # load-aware protocol (r12 verdict #5): record host load BEFORE each
    # pass; any pass starting above load1=8 marks the whole run
    # contended — regression calls require a non-contended artifact
    # (BASELINE.md "Artifact contract").
    pass_loads: list[float] = []
    for _pass in range(3):
        # settle before sampling: the previous pass's own 32-thread
        # work takes ~1 min to decay out of load1, and reading it as
        # "contention" marked healthy runs hot (r14: pass 3 started
        # at 8.02 purely from pass 2's tail). The recorded reading is
        # post-settle = external load only.
        pass_loads.append(_settle_load(threshold=6.0, timeout=90.0))
        for name, fn_name in HEADLINE.items():
            fn = getattr(entrymod, fn_name)
            start = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.time() - start
            if name not in times or dt < times[name]:
                times[name] = round(dt, 3)
                # per-query host weather (VERDICT r8 #4): the load when
                # the MINIMUM try finished — the reading that matters
                loads[name] = round(os.getloadavg()[0], 2)
    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf1 = _run_sf1_tier(spark)
    # Artifact contract (r12 verdict #1: BENCH_r12's headline was lost
    # to tail truncation of the printed line):
    #   (a) value/common_value lead the JSON line so a truncated TAIL
    #       still carries the headline numbers;
    #   (b) the full object is ALSO written to BENCH.json in the repo
    #       root, so the round artifact never depends on stdout capture.
    result = {
        "value": total,
        "common_value": round(
            sum(times[q] for q in COMMON if q in times), 3
        ),
        "metric": "headline_suite_sec",
        "unit": "sec",
        "protocol": "min_of_3_interleaved",
        # host weather: this VM shows ~5x run-to-run jitter from
        # EXTERNAL load (SCALE.md "Bench noise"); contended=True means
        # at least one pass STARTED above load1=8 and the run cannot
        # support a regression call
        "contended": any(l > 8 for l in pass_loads),
        "load1_per_pass": pass_loads,
        "queries": times,
        "sf": float(sf),
        # audit key for the round-stamp guard below: which core count
        # this run actually used (the driver also benches reduced-core)
        "cpus": (
            int(os.environ.get("SPARK_GRAFT_CPUS", ""))
            if os.environ.get("SPARK_GRAFT_CPUS", "").isdigit()
            else os.cpu_count()
        ),
        "sf1": sf1,
        "load1": round(os.getloadavg()[0], 2),
        "load1_per_query": loads,
    }
    line = json.dumps(result)
    # Artifact contract, part (c) — r13 verdict #1: the driver keeps
    # the LAST N bytes of stdout, so leading with value/common_value
    # (the r12 fix) put the headline in exactly the bytes that get
    # truncated. Repeat both keys at the very END of the line: JSON
    # parsers take the last duplicate key (same values either way), and
    # any tail capture now always carries the headline numbers.
    line = line[:-1] + (
        ', "value": %s, "common_value": %s}'
        % (result["value"], result["common_value"])
    )
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(repo_dir, "BENCH.json"), "w") as fh:
            fh.write(line + "\n")
        # part (d): BENCH.json is overwritten by EVERY run, so the
        # round's official numbers also land in a round-stamped file
        # later runs won't clobber (first-writer-wins per round; a
        # deliberate re-run can force with SPARK_GRAFT_RESTAMP=1).
        # Round from $SPARK_GRAFT_ROUND, else 1 + the highest driver
        # artifact already present. The name avoids the driver's own
        # BENCH_r{N}.json so the two capture paths never collide.
        rnd = os.environ.get("SPARK_GRAFT_ROUND")
        if not rnd:
            import re as _re

            stamped = [
                int(m.group(1))
                for f in os.listdir(repo_dir)
                for m in [_re.match(r"BENCH_r(\d+)\.json$", f)]
                if m
            ]
            rnd = str(max(stamped) + 1 if stamped else 1)
        self_path = os.path.join(repo_dir, f"BENCH_SELF_r{int(rnd)}.json")
        # r15 verdict #1: the driver's reduced-core scaling run (e.g.
        # SPARK_GRAFT_CPUS=8 on this 32-core box) must never claim the
        # round stamp — it measures scaling, not the official number.
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "")
        reduced_cores = cpus_env.isdigit() and int(cpus_env) < (
            os.cpu_count() or 1
        )
        official = (
            result["sf"] == 0.1
            and not result["sf1"].get("skipped")
            and not reduced_cores
        )  # sf0.01 quick loops / tier-skipped / reduced-core runs never stamp
        if official and (
            not os.path.exists(self_path)
            or os.environ.get("SPARK_GRAFT_RESTAMP") == "1"
        ):
            with open(self_path, "w") as fh:
                fh.write(line + "\n")
    except OSError:
        pass  # a read-only checkout must not sink the printed line
    print(line)


if __name__ == "__main__":
    main()
