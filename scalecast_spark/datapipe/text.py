"""Text-analysis operators for document pipelines.

All pure JVM expressions (regexp/length/split) — no Python UDFs — so
they run inside whole-stage codegen at full scan speed. Each operator
is a DataFrame→DataFrame function over a ``text`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: small multilingual stopword marker sets for the n-gram/marker-word
#: language heuristic. Public knowledge (most-common function words).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _word_count(col: Column) -> Column:
    # filter empties so "" and whitespace-only count 0, not 1
    return F.size(F.filter(F.split(F.trim(col), r"\s+"), lambda x: F.length(x) > 0))


def add_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (split on non-alphanumeric boundaries and count runs of ≤4 chars —
    a cheap, deterministic proxy for tokenizer length)."""
    c = F.col(text_col)
    words = _word_count(c)
    # subword proxy: ceil(len(word)/4) summed ≈ chars/4 + word boundaries
    subwords = (
        F.length(F.regexp_replace(c, r"\s+", "")) / F.lit(4.0)
    )
    return df.withColumn("n_tokens", words.cast("long")).withColumn(
        "n_subword_est", F.ceil(subwords + words).cast("long")
    )


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, punctuation density, stopword
    ratio, mean word length. Mirrors standard LLM-corpus filters
    (C4/Gopher-style rules) as pure column math."""
    c = F.col(text_col)
    n_chars = F.length(c)
    words = _word_count(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    stop_hits = F.lit(0)
    for wd in EN_STOPWORDS:
        stop_hits = stop_hits + F.size(F.split(F.concat(F.lit(" "), c, F.lit(" ")), f" {wd} ")) - 1
    # try_divide: empty/whitespace docs yield NULL ratios (and q_score 0)
    # instead of an ANSI DIVIDE_BY_ZERO
    punct_ratio = F.try_divide(punct, n_chars)
    mean_word_len = F.try_divide(F.length(F.regexp_replace(c, r"\s+", "")), words)
    return (
        df.withColumn("q_n_chars", n_chars.cast("long"))
        .withColumn("q_n_words", words.cast("long"))
        .withColumn("q_punct_ratio", F.round(punct_ratio, 6))
        .withColumn("q_stopword_ratio", F.round(F.try_divide(stop_hits, words), 6))
        .withColumn("q_mean_word_len", F.round(mean_word_len, 6))
        .withColumn(
            "q_score",
            F.coalesce(
                F.round(
                    F.when(words >= 5, 1.0).otherwise(0.0)
                    * F.when(mean_word_len.between(2.0, 12.0), 1.0).otherwise(0.5)
                    * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))),
                    6,
                ),
                F.lit(0.0),
            ),
        )
    )


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: score each candidate language by
    counting its top function words; argmax wins, ties break
    alphabetically. Deterministic and SQL-expressible (the oracle can
    replicate it verbatim)."""
    c = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = []
    out = df
    for lang, markers in sorted(LANG_MARKERS.items()):
        s = F.lit(0)
        for wd in markers:
            s = s + F.size(F.split(c, f" {wd} ")) - 1
        out = out.withColumn(f"_score_{lang}", s)
        scores.append(lang)
    best = F.greatest(*[F.col(f"_score_{s}") for s in scores])
    pred = F.lit(None).cast("string")
    for lang in reversed(scores):  # reversed so earlier langs win ties
        pred = F.when(F.col(f"_score_{lang}") == best, F.lit(lang)).otherwise(pred)
    out = out.withColumn("lang_pred", pred)
    return out.drop(*[f"_score_{s}" for s in scores])


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the casefolded,
    whitespace-normalized text. md5 is bit-identical across engines,
    which makes fingerprints portable between Spark jobs, DuckDB
    oracles, and external systems."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))
