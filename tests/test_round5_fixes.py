"""Round-5 advice fixes: fitted-plot None guard, string-id SemDeDup
routing, bm25 query normalization, anomaly temp-column collisions."""

import pytest
from pyspark.sql import functions as F


def test_fitted_plot_handles_combo(spark, sf_dir):
    """plot_fitted after a combo() must not raise. Since round 15 the
    combo banks member-averaged in-sample fitted values (reference
    parity: the reference's _bank_history stores FittedVals for combos
    too), so the combo now APPEARS in the fitted frame; models whose
    fitted entry is genuinely None (e.g. synthesize_models) are still
    skipped — fitted_plot_frame keeps its None guard."""
    from scalecast_spark import Forecaster
    from scalecast_spark.sources import events_to_series, load_table

    series = events_to_series(load_table(spark, sf_dir, "events"))
    f = Forecaster(series, future_dates=5)
    f.set_test_length(5)
    f.add_ar_terms(2)
    f.set_estimator("mlr").manual_forecast(call_me="mlr")
    f.combo(["mlr"], call_me="combo")
    from scalecast_spark.plotting import fitted_plot_frame

    frame = fitted_plot_frame(f)  # all models incl. the combo
    models = {r["model"] for r in frame.select("model").distinct().collect()}
    assert "mlr" in models and "actuals" in models
    assert "combo" in models  # combos bank fitted values since r15
    # the None guard itself stays covered: a history entry with
    # fitted=None must be skipped, not crash the frame builder
    f.history["combo"]["fitted"] = None
    frame2 = fitted_plot_frame(f)
    models2 = {r["model"] for r in frame2.select("model").distinct().collect()}
    assert "combo" not in models2 and "mlr" in models2


def test_semantic_dedup_string_ids_route_to_expr(spark):
    """String ids must not be silently NULLed by the gemm long-cast —
    duplicates are still marked via the expr path."""
    from scalecast_spark.datapipe.cluster import semantic_dedup

    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.999, 0.001]),
        ("c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(df, threshold=0.95, k=1, n_iter=1, method="gemm")
    kept = {r["vec_id"]: r["keep_sem"] for r in out.collect()}
    assert kept == {"a": True, "b": False, "c": True}


def test_bm25_uppercase_query_terms_normalized(spark):
    from scalecast_spark.datapipe.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "spark engine"), (2, "other text")], ["doc_id", "text"]
    )
    upper = bm25_topk(df, ["SPARK"], k=2).collect()
    lower = bm25_topk(df, ["spark"], k=2).collect()
    assert [r.asDict() for r in upper] == [r.asDict() for r in lower]
    assert upper and upper[0]["doc_id"] == 1

    with pytest.raises(ValueError):
        bm25_topk(df, ["   "])


def test_anomalies_survive_colliding_columns(spark):
    """An input already carrying _med/_mad/_lvl (e.g. a prior pass)
    must not raise an ambiguous-column error."""
    from scalecast_spark.functions.stattests import anomalies_from_residuals

    rows = [
        ("s", i, float(x), 0.0, 0.0, 0.0)
        for i, x in enumerate([1, 2, 1, 2, 1, 50, 1, 2])
    ]
    df = spark.createDataFrame(
        rows, ["series_id", "ds", "resid", "_med", "_mad", "_lvl"]
    )
    out = anomalies_from_residuals(df)
    flagged = [r["ds"] for r in out.filter("is_anomaly").collect()]
    assert flagged == [5]
    # caller's own columns come through untouched
    assert {"_med", "_mad", "_lvl"} <= set(out.columns)


def test_acf_constant_series_oracle_parity(spark):
    """Engine returns NULL acf values for a zero-variance series; the
    DuckDB oracle must agree (guarded lag-0 and NULLIF division)."""
    import duckdb

    sql = """
        WITH series AS (
            SELECT 's' AS series_id, ds, 5.0 AS y
            FROM (SELECT unnest(range(0, 20)) AS ds)
        ),
        acf_base AS (
            SELECT series_id,
                   y - avg(y) OVER (PARTITION BY series_id) AS dy,
                   row_number() OVER (PARTITION BY series_id
                                      ORDER BY ds) AS rn
            FROM series
        ),
        acf_c0 AS (
            SELECT series_id, sum(dy * dy) AS c0 FROM acf_base GROUP BY 1
        ),
        acf_ck AS (
            SELECT d.series_id, lg.lag, sum(d.dy * p.dy) AS ck
            FROM acf_base d
            JOIN (SELECT unnest(range(1, 13)) AS lag) lg ON TRUE
            JOIN acf_base p
              ON p.series_id = d.series_id AND p.rn = d.rn - lg.lag
            GROUP BY 1, 2
        )
        SELECT series_id, 0.0 AS lag,
               CASE WHEN c0 = 0 THEN NULL ELSE 1.0 END AS acf
        FROM acf_c0
        UNION ALL
        SELECT c.series_id, c.lag::DOUBLE,
               round(c.ck / NULLIF(z.c0, 0), 6)
        FROM acf_ck c JOIN acf_c0 z USING (series_id)
    """
    vals = [r[2] for r in duckdb.sql(sql).fetchall()]
    assert vals and all(v is None for v in vals)


def test_blocked_pairwise_rejects_string_ids(spark):
    """Same hazard class as the semantic_dedup gemm cast: string ids
    must fail loudly, not come back as NULL pair endpoints."""
    from scalecast_spark.datapipe.similarity import blocked_pairwise_above

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.001])], ["vec_id", "embedding"]
    )
    with pytest.raises(TypeError, match="integral"):
        blocked_pairwise_above(df, 0.9)
