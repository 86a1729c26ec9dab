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


def tfidf_top_terms(
    df: DataFrame, top_k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic corpus statistic
    for keyword extraction / topic labeling at curation time.

    tf = term count within the doc; idf = ln((N+1)/(df_t+1)) + 1 (the
    sklearn smooth-idf convention). Everything is JVM-side: one explode
    + two aggregates + a windowed top-k; the doc-frequency frame is
    tiny (vocab-sized) and broadcast back onto the term frame.
    Deterministic ties: score DESC, term ASC.
    """
    from pyspark.sql import Window as W

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = (
        df.select(id_col, F.explode(F.split(norm, " ")).alias("term"))
        .filter(F.length("term") > 0)
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df_t"))
    idf = dfreq.withColumn(
        "idf", F.log((F.lit(float(n_docs + 1))) / (F.col("df_t") + 1)) + 1.0
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(F.broadcast(idf.select("term", "idf")), "term")
        .withColumn("score", F.round(F.col("tf") * F.col("idf"), 6))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"), "score", F.col("_rn").alias("rank"))
    )
