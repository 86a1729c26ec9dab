"""Hand-computed expectations for the C4/Gopher document-structure
signals (datapipe/text.add_c4_signals) and the opt-in curation gates."""

import pytest

from scalecast_spark.datapipe.text import add_c4_signals, curate_corpus


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return add_c4_signals(df).first().asDict()


def test_line_fractions(spark):
    text = "This first line ends quite properly.\n- bullet item\nshort\nTrailing thought..."
    r = _one(spark, text)
    # 4 lines; 1 ends in terminal punct ("." — "..." also ends in '.')
    assert r["term_punct_line_frac"] == pytest.approx(0.5, abs=1e-6)
    assert r["bullet_line_frac"] == pytest.approx(0.25, abs=1e-6)
    assert r["ellipsis_line_frac"] == pytest.approx(0.25, abs=1e-6)
    # "- bullet item" (3 words), "short" (1), "Trailing thought..." (2)
    assert r["short_line_frac"] == pytest.approx(0.75, abs=1e-6)


def test_word_level_signals(spark):
    r = _one(spark, "the cat sat 123 ### on 42 mats...")
    # words: the cat sat 123 ### on 42 mats... -> 8; alpha: 5 (mats... has letters)
    assert r["alpha_word_frac"] == pytest.approx(5 / 8, abs=1e-6)
    # symbols: "###" is one '#'-alternation? regexp matches '#' 3x + '...' 1x = 4
    assert r["symbol_word_ratio"] == pytest.approx(4 / 8, abs=1e-6)
    # stop words present: the, on is not in the Gopher set -> only "the"
    assert r["stop_hits_gopher"] == 1


def test_sentences_and_markers(spark):
    r = _one(spark, "One. Two! Three? And {code} with Lorem Ipsum and JavaScript.")
    assert r["n_sentences"] == 4
    assert r["has_lorem_ipsum"]
    assert r["has_curly_brace"]
    assert r["has_js_marker"]
    # of/and/with... the Gopher set hits: and, with -> 2
    assert r["stop_hits_gopher"] == 2


def test_empty_doc(spark):
    r = _one(spark, "")
    for k in (
        "term_punct_line_frac", "short_line_frac", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "symbol_word_ratio",
    ):
        assert r[k] == 0.0, k
    assert r["n_sentences"] == 0
    assert r["stop_hits_gopher"] == 0
    assert not r["has_curly_brace"]


def test_c4_gates_fire_in_curate_corpus(spark):
    stops = "the be to of and that have with"
    good = (
        " ".join(f"{stops} alpha{i} bravo{i} charlie{i}." for i in range(8))
    )
    bad = "{ lorem ipsum } " + "#### 123 456 " * 30
    df = spark.createDataFrame([(1, good), (2, bad)], ["doc_id", "text"])
    out = curate_corpus(df, c4_gates=True, min_quality=0.0).select(
        "doc_id", "keep", "drop_reasons"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["keep"], rows[1]["drop_reasons"]
    assert not rows[2]["keep"]
    reasons = set(rows[2]["drop_reasons"])
    assert {"lorem_ipsum", "curly_brace", "low_alpha_words"} <= reasons
    # default path untouched
    assert "alpha_word_frac" not in curate_corpus(df).columns


def test_curation_report(spark):
    from pyspark.sql import functions as F

    from scalecast_spark.datapipe.text import curation_report

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is a fine day today ok", "a"),
            (1, "spam spam spam spam spam spam spam spam spam spam", "a"),
            (2, "hi", "b"),
        ],
        "doc_id long, text string, source string",
    )
    cur = curate_corpus(docs)
    rep = {r["reason"]: r for r in curation_report(cur).collect()}
    assert rep["__kept__"]["n_docs"] == 1
    assert rep["too_few_tokens"]["n_docs"] == 1
    assert rep["repetitive_2grams"]["n_docs"] == 1
    assert rep["__kept__"]["share"] == pytest.approx(1 / 3, abs=1e-6)
    by_src = curation_report(cur, "source").collect()
    a_kept = [r for r in by_src if r["source"] == "a" and r["reason"] == "__kept__"]
    assert a_kept[0]["share"] == pytest.approx(0.5, abs=1e-6)
