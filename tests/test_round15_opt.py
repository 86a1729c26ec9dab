"""Round-15 OPTIMIZATION parity lanes: every perf rewrite must be
value-identical to the path it replaces.

Lane 1 — fused test+full kernel (kernel.run_kernel_testfull): one
applyInPandas job replaces manual_forecast's two kernel passes; the
banked forecast/fitted/test_preds frames must match the legacy two-pass
output row-for-row (exact), summaries to float aggregation-order
tolerance (the fused frame's different partition layout legally
reorders the metric sums).
"""

import math
import os

import pytest

from scalecast_spark.forecaster import Forecaster


def _build(spark, sf_dir, test_length=7):
    from __spark_entry__ import _series

    f = Forecaster(_series(spark, sf_dir), future_dates=7)
    f.set_test_length(test_length)
    f.add_ar_terms(3).add_time_trend().add_seasonal_regressors(
        "dayofweek", raw=True
    )
    return f


def _snap(f, m):
    h = f.history[m]
    fc = sorted(tuple(r) for r in h["forecast"].collect())
    ft = sorted(tuple(r) for r in h["fitted"].collect())
    tp = (
        sorted(tuple(r) for r in h["test_preds"].collect())
        if h["test_preds"] is not None else None
    )
    return fc, ft, tp, dict(h["summary"])


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize(
    "est,kw,tl",
    [
        ("mlr", {}, 7),
        ("ridge", {"alpha": 0.5, "normalizer": "minmax"}, 7),
        ("knn", {"n_neighbors": 4, "dynamic_testing": 2}, 7),
        ("ridge", {"alpha": 1.0}, 0),
    ],
)
def test_fused_testfull_matches_two_pass(spark, sf_dir, est, kw, tl):
    old = os.environ.get("SPARK_GRAFT_FUSED_TESTFULL")
    try:
        os.environ["SPARK_GRAFT_FUSED_TESTFULL"] = "0"
        f1 = _build(spark, sf_dir, tl)
        f1.set_estimator(est)
        f1.manual_forecast(call_me="m", **kw)
        a = _snap(f1, "m")
        os.environ["SPARK_GRAFT_FUSED_TESTFULL"] = "1"
        f2 = _build(spark, sf_dir, tl)
        f2.set_estimator(est)
        f2.manual_forecast(call_me="m", **kw)
        b = _snap(f2, "m")
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_FUSED_TESTFULL", None)
        else:
            os.environ["SPARK_GRAFT_FUSED_TESTFULL"] = old
    assert a[0] == b[0]  # forecast rows exact
    assert a[1] == b[1]  # fitted rows exact
    assert a[2] == b[2]  # test predictions exact
    assert set(a[3]) == set(b[3])
    for k in a[3]:
        assert _close(a[3][k], b[3][k]), (k, a[3][k], b[3][k])


def test_infer_meta_matches_infer_freq_and_stats(spark, sf_dir):
    """Lane 2 — the fused ingest-metadata job: infer_meta's frequency
    must be bit-identical to infer_freq (same count-desc/delta-asc
    ordering rule), its stats identical to the per-series aggregate
    cross_validate used to collect, and the cached stats must survive
    feature ops but NOT row-changing ops."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _series
    from scalecast_spark import TimeSeriesFrame

    tsf = TimeSeriesFrame.from_long(_series(spark, sf_dir))
    freq, n_series, min_obs = tsf.infer_meta()
    assert freq == tsf.infer_freq()
    row = (
        tsf.observed.groupBy("series_id").count()
        .agg(F.min("count").alias("_min"), F.count("*").alias("_n"))
        .collect()[0]
    )
    assert (n_series, min_obs) == (int(row["_n"]), int(row["_min"]))
    # from_long cached them; feature ops carry, chops drop
    assert getattr(tsf, "_stats", None) == (n_series, min_obs)
    feat = tsf.with_features(
        tsf.df.withColumn("xx", F.lit(1.0)), ["xx"]
    )
    assert getattr(feat, "_stats", None) == (n_series, min_obs)
    chopped = tsf.chop_from_front(3)
    assert getattr(chopped, "_stats", None) is None
    # Forecaster._series_stats re-collects on a stats-less frame and
    # reflects the chop
    from scalecast_spark import Forecaster

    f = Forecaster(_series(spark, sf_dir), future_dates=3)
    assert f._series_stats() == (n_series, min_obs)
    f.chop_from_front(3)
    assert f._series_stats() == (n_series, min_obs - 3)


def test_pq_arrow_twins_bitexact(spark, sf_dir):
    """Lane 3 — the Arrow PQ kernels (training assignment + encode)
    must be BIT-exact twins of the staged-HOF SQL forms: the kernels
    replicate every SQL fold as a per-dimension vectorized
    accumulation (same left-to-right float order), so trained
    codebooks compare equal as floats and encodes row-for-row,
    including NULL-vector pass-through."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _emb
    from scalecast_spark.datapipe.similarity import (
        ivf_centroids,
        ivfpq_encode,
        pq_codebooks_trained,
    )

    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb, 8, "embedding", "vec_id")
    old = os.environ.get("SPARK_GRAFT_PQ_ARROW")

    def rows(df):
        return sorted(
            (
                r["vec_id"], r["cell"],
                tuple(r["pq_codes"]) if r["pq_codes"] is not None else None,
            )
            for r in df.select("vec_id", "cell", "pq_codes").collect()
        )

    try:
        os.environ["SPARK_GRAFT_PQ_ARROW"] = "0"
        b_sql = pq_codebooks_trained(
            emb, 8, 16, 2, "embedding", "vec_id", cents=cents
        )
        os.environ["SPARK_GRAFT_PQ_ARROW"] = "1"
        b_arw = pq_codebooks_trained(
            emb, 8, 16, 2, "embedding", "vec_id", cents=cents
        )
        assert b_sql == b_arw  # exact float equality, all subspaces
        embn = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 7 == 0, None).otherwise(
                F.col("embedding")
            ),
        )
        os.environ["SPARK_GRAFT_PQ_ARROW"] = "0"
        e_sql = rows(ivfpq_encode(embn, cents, b_sql, residual=True))
        os.environ["SPARK_GRAFT_PQ_ARROW"] = "1"
        e_arw = rows(ivfpq_encode(embn, cents, b_arw, residual=True))
        assert e_sql == e_arw
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_PQ_ARROW", None)
        else:
            os.environ["SPARK_GRAFT_PQ_ARROW"] = old


def test_simhash_arrow_twin_bitexact(spark, sf_dir):
    """Lane 4 — the Arrow simhash kernel vs the explode + 60-column
    conditional-sum expression form: fingerprints are integer-exact
    (md5 over the same UTF-8 bytes, same +1/-1 bit sums), and docs
    with no non-empty words drop from the output exactly like the
    explode form drops them."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _docs
    from scalecast_spark.datapipe.dedup import simhash

    docs = _docs(spark, sf_dir)
    edge = docs.limit(3).withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.lit(""))
        .when(F.col("doc_id") % 3 == 1, F.lit("   "))
        .otherwise(F.lit(None)),
    )
    old = os.environ.get("SPARK_GRAFT_SIMHASH_ARROW")
    try:
        os.environ["SPARK_GRAFT_SIMHASH_ARROW"] = "0"
        a = sorted(map(tuple, simhash(docs).collect()))
        a2 = sorted(map(tuple, simhash(edge).collect()))
        os.environ["SPARK_GRAFT_SIMHASH_ARROW"] = "1"
        b = sorted(map(tuple, simhash(docs).collect()))
        b2 = sorted(map(tuple, simhash(edge).collect()))
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_SIMHASH_ARROW", None)
        else:
            os.environ["SPARK_GRAFT_SIMHASH_ARROW"] = old
    assert a == b and len(a) > 0
    assert a2 == b2 == []  # all-empty docs vanish on both paths


def test_trigram_arrow_twin_exact(spark, sf_dir):
    """Lane 5 — the Arrow trigram-LM kernel vs the declarative
    explode + broadcast-join form: identical (doc_id, tri_logprob)
    sets on the real corpus AND on an edge frame (NULL text, empty,
    whitespace-only, <3 normalized chars, non-BMP code points,
    whitespace runs the JVM _norm collapses). The kernel replicates
    the per-doc sequential position-order fold; the 4dp round is the
    operator's documented cross-engine tolerance."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _docs
    from scalecast_spark.datapipe.text import add_trigram_logprob

    docs = _docs(spark, sf_dir)
    edge_rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "ab"),                     # 2 normalized chars -> NULL
        (5, "a  b"),                   # collapses to 'a b' (3 chars)
        (6, "The  THE the"),           # lowercase + run collapse
        (7, "naïve café"),   # accented BMP
        (8, "\U0001f600\U0001f601\U0001f600ab"),  # non-BMP emoji
        (9, "abcabcabc"),
    ]
    edge = spark.createDataFrame(edge_rows, "doc_id long, text string")
    old = os.environ.get("SPARK_GRAFT_TRIGRAM_ARROW")
    try:
        os.environ["SPARK_GRAFT_TRIGRAM_ARROW"] = "0"
        a = sorted(
            map(tuple, add_trigram_logprob(docs).select(
                "doc_id", "tri_logprob").collect())
        )
        a2 = sorted(
            map(tuple, add_trigram_logprob(edge).select(
                "doc_id", "tri_logprob").collect())
        )
        os.environ["SPARK_GRAFT_TRIGRAM_ARROW"] = "1"
        b = sorted(
            map(tuple, add_trigram_logprob(docs).select(
                "doc_id", "tri_logprob").collect())
        )
        b2 = sorted(
            map(tuple, add_trigram_logprob(edge).select(
                "doc_id", "tri_logprob").collect())
        )
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_TRIGRAM_ARROW", None)
        else:
            os.environ["SPARK_GRAFT_TRIGRAM_ARROW"] = old
    assert a == b and len(a) > 0
    assert a2 == b2 and len(a2) == len(edge_rows)
    nulls = {r[0] for r in a2 if r[1] is None}
    assert nulls == {1, 2, 3, 4}  # short/empty/NULL docs stay NULL


def test_fused_path_routes_kernel_estimators_only(spark, sf_dir):
    """Non-kernel estimators and unmappable kwargs must fall back to
    the generic path (cell resolution returns None), mirroring
    _grid_cells' TypeError convention."""
    f = _build(spark, sf_dir)
    f.set_estimator("ridge")
    assert f._kernel_cell_from_kwargs({"alpha": 1.0}) is not None
    assert f._kernel_cell_from_kwargs({"alpha": 1.0, "nope": 3}) is None
    f.set_estimator("hwes")
    assert f._kernel_cell_from_kwargs({}) is None


def test_compute_heavy_text_stages_are_spread(spark, sf_dir):
    """Lane 6 — the single-file-corpus spread (guide §2.5): the gopher
    kernel, the contamination n-gram explode, and the quality-model
    hash projection must run on a repartitioned input, not the scan's
    single partition (a refactor dropping the Exchange would pass every
    value test and still serialize the per-doc work on one core)."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _docs
    from scalecast_spark.datapipe.quality_model import score_quality
    from scalecast_spark.datapipe.text import (
        add_gopher_signals_fast,
        contamination_hits,
    )

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )

    docs = _docs(spark, sf_dir)
    p = plan(add_gopher_signals_fast(docs, include_base=True))
    # the Exchange must sit BELOW the kernel (its input), i.e. appear
    # after MapInPandas in the printed tree
    assert "Exchange" in p.split("MapInPandas", 1)[1]
    p = plan(contamination_hits(docs, docs.filter(F.col("doc_id") % 20 == 0)))
    assert "Exchange hashpartitioning(doc_id" in p
    p = plan(score_quality(docs, weights=[0.1] * 65))
    assert "Exchange" in p


def test_pack_mappart_twin_exact(spark, sf_dir):
    """Lane 7 — pack_sequences' one-task-per-partition form vs the
    per-group applyInPandas form: identical (key, bucket, bin) rows on
    the real corpus and on an edge frame (over-capacity docs, empty
    buckets, single-doc buckets)."""
    from __spark_entry__ import _docs
    from scalecast_spark.datapipe.sample import pack_sequences

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    edge = spark.createDataFrame(
        [(1, 5000.0), (2, 10.0), (3, 10.0), (4, 2048.0), (5, 1.0)],
        "doc_id long, n_chars double",
    )
    old = os.environ.get("SPARK_GRAFT_PACK_MAPPART")
    try:
        outs = {}
        for flag in ("0", "1"):
            os.environ["SPARK_GRAFT_PACK_MAPPART"] = flag
            outs[flag] = (
                sorted(map(tuple, pack_sequences(
                    docs, 2048.0, "n_chars", "doc_id").collect())),
                sorted(map(tuple, pack_sequences(
                    edge, 2048.0, "n_chars", "doc_id").collect())),
            )
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_PACK_MAPPART", None)
        else:
            os.environ["SPARK_GRAFT_PACK_MAPPART"] = old
    assert outs["0"][0] == outs["1"][0] and len(outs["1"][0]) > 0
    assert outs["0"][1] == outs["1"][1] and len(outs["1"][1]) == 5
