"""Hand-computed expectations for the full Gopher repetition family
(datapipe/text.add_gopher_signals): duplicate-paragraph fraction,
line/paragraph char fractions, top-n-gram char fractions, and
duplicated-n-gram char fractions (Rae et al. 2021 table A1)."""

import pytest

from scalecast_spark.datapipe.text import add_gopher_signals


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return add_gopher_signals(df, **kw).first().asDict()


def test_duplicate_paragraphs(spark):
    r = _one(spark, "para one\n\npara one\n\npara two")
    # 3 paragraphs, 2 distinct -> 1 - 2/3
    assert r["dup_para_frac"] == pytest.approx(0.333333, abs=1e-6)
    # "para one" (8 chars) occurs twice: 16 of 24 paragraph chars
    assert r["dup_para_char_frac"] == pytest.approx(0.666667, abs=1e-6)
    # single-newline split sees the same three non-empty lines
    assert r["dup_line_char_frac"] == pytest.approx(0.666667, abs=1e-6)


def test_top2gram_char_frac(spark):
    r = _one(spark, "a b a b c")
    # bigrams: [a b, b a, a b, b c]; mode "a b" count 2, len 3 -> 6/9
    assert r["top2gram_char_frac"] == pytest.approx(0.666667, abs=1e-6)
    # only one 5-gram exists -> nothing duplicated
    assert r["dup5gram_char_frac"] == 0.0


def test_dup5gram_char_frac(spark):
    r = _one(spark, "x y z w v x y z w v")
    # "x y z w v" (9 chars) occurs twice among the six 5-grams -> 18/19
    assert r["dup5gram_char_frac"] == pytest.approx(18 / 19, abs=1e-6)


def test_overlap_cap_at_one(spark):
    r = _one(spark, "a a a a a a")
    # two identical 5-grams cover 18 chars of an 11-char doc -> capped
    assert r["dup5gram_char_frac"] == 1.0


def test_empty_and_short_docs_are_zero(spark):
    r = _one(spark, "")
    for k, v in r.items():
        if k.endswith("_frac"):
            assert v == 0.0, k
    r = _one(spark, "one two")
    assert r["dup_para_frac"] == 0.0
    assert r["top4gram_char_frac"] == 0.0


def test_column_set_and_existing_columns_survive(spark):
    df = spark.createDataFrame([(1, "a b c", "keep")], ["doc_id", "text", "extra"])
    out = add_gopher_signals(df)
    cols = set(out.columns)
    assert {"doc_id", "text", "extra"} <= cols
    for n in (2, 3, 4):
        assert f"top{n}gram_char_frac" in cols
    for n in range(5, 11):
        assert f"dup{n}gram_char_frac" in cols
    assert {"dup_para_frac", "dup_line_char_frac", "dup_para_char_frac"} <= cols
    # no temp columns leak
    assert not [c for c in cols if c.startswith("_gph")]


def test_ties_break_toward_more_characters(spark):
    # "aa bb" and "b c" both... construct counts tie: bigrams of
    # "aa bb aa bb b c b c": [aa bb, bb aa, aa bb, bb b, b c, c b, b c]
    # counts: "aa bb"=2 (len 5), "b c"=2 (len 3) -> mode chars = 2*5
    r = _one(spark, "aa bb aa bb b c b c")
    assert r["top2gram_char_frac"] == pytest.approx(10 / 19, abs=1e-6)


def test_curate_corpus_gopher_gates_fire(spark):
    from scalecast_spark.datapipe.text import curate_corpus

    # Gopher applies the char-frac gates to real-length (50+ word)
    # documents; on tiny docs the top-n-gram fraction is dominated by
    # the single longest n-gram and the thresholds misfire by design.
    good = " ".join(f"word{i:02d}" for i in range(60))
    spammy = "buy now " * 40
    df = spark.createDataFrame(
        [(1, good), (2, spammy)], ["doc_id", "text"]
    )
    out = curate_corpus(df, gopher_char_gates=True).select(
        "doc_id", "keep", "drop_reasons"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["keep"]
    assert not rows[2]["keep"]
    assert "top2gram_chars" in rows[2]["drop_reasons"]
    # default path unchanged: no gopher columns, no gopher rules
    base = curate_corpus(df)
    assert "dup_para_frac" not in base.columns


def test_fast_kernel_parity_with_column_math(spark):
    """add_gopher_signals_fast must be BIT-identical to the declarative
    add_gopher_signals on the real sf0.001 corpus (incl. rounding)."""
    from scalecast_spark.datapipe.text import (
        add_gopher_signals,
        add_gopher_signals_fast,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    slow = add_gopher_signals(docs).drop("text").toPandas().set_index("doc_id").sort_index()
    fast = add_gopher_signals_fast(docs).drop("text").toPandas().set_index("doc_id").sort_index()
    assert list(slow.columns) == list(fast.columns)
    for c in slow.columns:
        assert (slow[c].values == fast[c].values).all(), c


def test_fast_kernel_parity_on_edge_docs(spark):
    from scalecast_spark.datapipe.text import (
        add_gopher_signals,
        add_gopher_signals_fast,
    )

    rows = [
        (1, ""),
        (2, "   \n\n  \t "),
        (3, "a a a a a a"),
        (4, "para one\n\npara one\n\npara two"),
        (5, "x y z w v x y z w v"),
        (6, "Mixed CASE Text\nmixed case text\n\nMIXED case TEXT"),
        (7, "one-word"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    slow = add_gopher_signals(df).drop("text").toPandas().set_index("doc_id").sort_index()
    fast = add_gopher_signals_fast(df).drop("text").toPandas().set_index("doc_id").sort_index()
    for c in slow.columns:
        assert (slow[c].values == fast[c].values).all(), c


def test_include_base_matches_column_math(spark):
    from scalecast_spark.datapipe.text import (
        add_gopher_signals_fast,
        add_repetition_signals,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    want = (
        add_repetition_signals(docs)
        .select("doc_id", "dup_line_frac", "top2gram_frac")
        .toPandas().set_index("doc_id").sort_index()
    )
    got = (
        add_gopher_signals_fast(docs, include_base=True)
        .select("doc_id", "dup_line_frac", "top2gram_frac")
        .toPandas().set_index("doc_id").sort_index()
    )
    for c in want.columns:
        assert (want[c].values == got[c].values).all(), c
    # edge docs too
    edge = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "a b a b"), (4, "x\nx\ny")],
        ["doc_id", "text"],
    )
    w2 = add_repetition_signals(edge).select(
        "doc_id", "dup_line_frac", "top2gram_frac"
    ).toPandas().set_index("doc_id").sort_index()
    g2 = add_gopher_signals_fast(edge, include_base=True).select(
        "doc_id", "dup_line_frac", "top2gram_frac"
    ).toPandas().set_index("doc_id").sort_index()
    for c in w2.columns:
        assert (w2[c].values == g2[c].values).all(), c
