"""Physical-plan shape guards: the scale properties PLANS.md documents
must not silently regress (a refactor that reintroduces a
BroadcastNestedLoopJoin or a row-at-a-time Python UDF would pass every
value test and still be wrong at 100 TB). Explain strings are checked
at sf0.001 — plan SHAPE is scale-invariant for these queries."""

import sys

import pytest

sys.path.insert(0, ".")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


@pytest.mark.parametrize(
    "qname",
    [
        "q_tpch_q1_pricing",
        "q_tpch_q5_nation_revenue",
        "q_dedup_jaccard_pairs",
        "q_text_curation",
        "q_emb_near_dup",
        "q_dedup_exact",
        "q_sim_cosine_topk",
    ],
)
def test_no_nested_loop_or_python_row_udf(spark, sf_dir, qname):
    import __spark_entry__ as entrymod

    plan = _plan(getattr(entrymod, qname)(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, qname
    assert "CartesianProduct" not in plan, qname
    assert "BatchEvalPython" not in plan, qname  # row-at-a-time UDF


def test_broadcast_join_shapes(spark, sf_dir):
    import __spark_entry__ as entrymod

    # dims broadcast in the TPC-H join query
    q5 = _plan(entrymod.q_tpch_q5_nation_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in q5
    assert "SortMergeJoin" not in q5  # all dims are broadcastable
    # decontamination: benchmark n-gram set broadcast, corpus not shuffled
    cur = _plan(entrymod.q_text_curation(spark, sf_dir))
    assert "BroadcastHashJoin" in cur


def test_topk_uses_bounded_heap(spark, sf_dir):
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_sim_cosine_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # not a global Sort + Limit


def test_scan_pruning_reaches_parquet(spark, sf_dir):
    import __spark_entry__ as entrymod

    # another test may have cached documents with ALL columns; a cache
    # hit replaces the parquet scan with an InMemoryRelation and the
    # pruning assertion would test the wrong plan
    spark.catalog.clearCache()
    plan = _plan(entrymod.q_dedup_exact(spark, sf_dir))
    # exact dedup needs only (doc_id, text): the scan must not read
    # lang/source/n_chars
    assert "n_chars" not in plan
