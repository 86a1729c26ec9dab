"""Property-based tests (hypothesis): invariants the reference checks
only at fixed points (test_SeriesTransformer.py round-trips), verified
here over randomized series. Few examples per property — each example
is a Spark job — but randomized shapes/values catch alignment bugs
fixed-fixture tests cannot."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st, HealthCheck

from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.operators import transforms as tr

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

series_strategy = st.lists(
    st.floats(min_value=0.5, max_value=1e4, allow_nan=False),
    min_size=20,
    max_size=60,
)


def _frame(spark, values, sid="p"):
    return spark.createDataFrame(
        pd.DataFrame({
            SERIES: [sid] * len(values),
            DS: pd.date_range("2023-01-01", periods=len(values)),
            Y: np.asarray(values, dtype=float),
        })
    )


@given(values=series_strategy, m=st.sampled_from([1, 3, 7]))
@settings(**SETTINGS)
def test_diff_roundtrip_any_series(spark, values, m):
    from pyspark.sql import functions as F

    src = _frame(spark, values).withColumn("is_future", F.lit(0))
    t = tr.DiffTransform(m)
    t.fit(src)
    back = t.invert(t.transform(src, Y), Y)
    joined = (
        src.select(DS, F.col(Y).alias("y0"))
        .join(back.select(DS, F.col(Y).alias("y1")), DS)
        .agg(F.max(F.abs(F.col("y0") - F.col("y1")))).collect()[0][0]
    )
    assert joined is None or joined < 1e-6


@given(values=series_strategy)
@settings(**SETTINGS)
def test_scale_roundtrip_any_series(spark, values):
    from pyspark.sql import functions as F

    src = _frame(spark, values).withColumn("is_future", F.lit(0))
    t = tr.ScaleTransform().fit(src)
    back = t.invert(t.transform(src, Y), Y)
    err = (
        src.select(DS, F.col(Y).alias("y0"))
        .join(back.select(DS, F.col(Y).alias("y1")), DS)
        .agg(F.max(F.abs(F.col("y0") - F.col("y1")))).collect()[0][0]
    )
    # constant series scale to NULL (sigma=0, try_divide) and cannot
    # round-trip; any non-degenerate series must
    if err is not None:
        assert err < 1e-6


@given(
    a=st.lists(st.floats(1, 100, allow_nan=False), min_size=5, max_size=20),
)
@settings(**SETTINGS)
def test_metric_identities(spark, a):
    """rmse² == mse, mae ≤ rmse, r2(y,y) == 1 — on random vectors."""
    import pandas as pd
    from scalecast_spark.functions import metrics as M

    f = [x * 1.1 + 0.5 for x in a]
    df = spark.createDataFrame(pd.DataFrame({"actual": a, "forecast": f}))
    row = M.evaluate(df, metrics=["rmse", "mse", "mae"]).collect()[0]
    assert row["rmse"] ** 2 == pytest.approx(row["mse"], rel=1e-9)
    assert row["mae"] <= row["rmse"] + 1e-12
    perfect = spark.createDataFrame(pd.DataFrame({"actual": a, "forecast": a}))
    r2 = M.evaluate(perfect, metrics=["r2"]).collect()[0]["r2"]
    if r2 is not None:  # constant vectors have sst=0 → NULL
        assert r2 == pytest.approx(1.0)


@given(texts=st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_dedup_exact_idempotent(spark, texts):
    """dedup(dedup(x)) == dedup(x) and duplicates collapse."""
    import pandas as pd
    from scalecast_spark.datapipe.dedup import dedup_exact

    pdf = pd.DataFrame({"doc_id": range(len(texts) * 2),
                        "text": list(texts) * 2})
    df = spark.createDataFrame(pdf)
    once = dedup_exact(df)
    twice = dedup_exact(once)
    assert once.count() == twice.count()
    # every normalized text appears exactly once
    import re
    norms = {re.sub(r"\s+", " ", t.strip().lower()) for t in texts}
    assert once.count() == len(norms)


text_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("ab cd\nef.!🦀 \r\t "), min_size=0, max_size=120
    ),
    min_size=1,
    max_size=12,
)


@given(texts=text_strategy, n=st.sampled_from([1, 2, 3, 8]))
@settings(**SETTINGS)
def test_shingle_array_matches_python(spark, texts, n):
    """dedup.shingle_array's zip-chain == a straightforward python
    shingler, including the short-doc single-shingle convention and
    whitespace/unicode edge cases (one Spark job for all examples)."""
    from scalecast_spark.datapipe.dedup import shingle_array
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: sorted(r["sh"])
        for r in df.select(
            "i", shingle_array(F.col("text"), n).alias("sh")
        ).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in " ".join(t.lower().strip().split()).split(" ") if w]
        if len(words) >= n:
            want = {" ".join(words[j:j + n]) for j in range(len(words) - n + 1)}
        else:
            want = {" ".join(words)} - {""}
        assert got[i] == sorted(want), (t, n)


@given(texts=text_strategy)
@settings(**SETTINGS)
def test_repetition_signals_match_python(spark, texts):
    from collections import Counter

    from scalecast_spark.datapipe.text import add_repetition_signals

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in add_repetition_signals(df).collect()}
    for i, t in enumerate(texts):
        lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
        want_dup = round(1 - len(set(lines)) / len(lines), 6) if lines else 0.0
        assert got[i]["dup_line_frac"] == pytest.approx(want_dup, abs=1e-6)
        words = [w for w in " ".join(t.lower().strip().split()).split(" ") if w]
        bgs = [f"{a} {b}" for a, b in zip(words, words[1:])]
        want_top = (
            round(Counter(bgs).most_common(1)[0][1] / len(bgs), 6) if bgs else 0.0
        )
        assert got[i]["top2gram_frac"] == pytest.approx(want_top, abs=1e-6)
