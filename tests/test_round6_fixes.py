"""Round-6 ADVICE fixes, each pinned by the counterexample from the
round-5 advisor report:

1. pacf_frame(acf=..., alpha=...) raised AttributeError on df=None (and
   could silently mix preprocessing with a real df) -> now a clear
   ValueError.
2. The Box-Cox / Yeo-Johnson profile-likelihood oracles crashed DuckDB
   with 'cannot take logarithm of zero' on constant series -> NULLIF
   guard lets the degenerate lambda fall through the isfinite filter to
   the engine's fallback.
3. pacf on a zero-variance series emitted 1.0/NaN while the oracle
   emitted 1.0/NULL -> both sides now NULL at every lag (the acf
   member's convention).
4. semantic_dedup silently downgraded method='gemm' to 'expr' on
   string ids -> now warns.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark import plotting as P
from scalecast_spark.frame import DS, SERIES, Y


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        rows.append(
            ("a", pd.Timestamp("2024-01-01") + pd.Timedelta(days=i),
             float(rng.normal() + 0.1 * i))
        )
    return spark.createDataFrame(pd.DataFrame(rows, columns=[SERIES, DS, Y]))


def test_pacf_frame_rejects_alpha_with_precomputed_acf(toy):
    acf = P.acf_frame(toy, nlags=4)
    with pytest.raises(ValueError, match="alpha"):
        P.pacf_frame(None, nlags=4, acf=acf, alpha=0.05)
    with pytest.raises(ValueError, match="alpha"):
        P.pacf_frame(toy, nlags=4, acf=acf, alpha=0.05)
    # acf alone still works (the correlogram-family path)
    out = P.pacf_frame(None, nlags=4, acf=acf).toPandas()
    assert len(out) == 5 and out["pacf"].iloc[0] == 1.0


def test_boxcox_ll_oracles_survive_constant_series():
    """The lambda-grid CTEs must not abort on var_pop = 0: DuckDB's
    ln(0) is a hard error, so a single constant positive series used
    to kill the whole ts_power_transforms / ts_prophet_tbats oracle
    query. With the NULLIF guard the ll is NULL, the isfinite filter
    drops it, and coalesce picks the engine's lambda=1 fallback."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE series AS SELECT 's0' AS series_id, "
        "range AS ds, 5.0 AS y FROM range(20)"
    )
    # the guarded pattern, verbatim from the tbats oracle's bll CTE
    row = con.execute(
        """
        SELECT g.lam,
               -0.5 * count(*) * ln(NULLIF(var_pop(
                   CASE WHEN abs(g.lam) < 1e-12 THEN ln(s.y)
                        ELSE (pow(s.y, g.lam) - 1) / g.lam END), 0))
               + (g.lam - 1) * sum(ln(s.y)) AS ll
        FROM series s CROSS JOIN (SELECT 0.5 AS lam) g
        GROUP BY 1
        """
    ).fetchone()
    assert row[1] is None  # NULL, not an exception
    # and the unguarded form really does raise (the bug being fixed)
    with pytest.raises(duckdb.Error):
        con.execute(
            "SELECT ln(var_pop(y)) FROM series"
        ).fetchone()


def test_pacf_constant_series_matches_oracle_nulls(spark):
    """Engine and oracle agree on zero-variance series: every pacf lag
    NULL, including lag 0 (previously engine=1.0+NaN, oracle=1.0+NULL
    -> hash mismatch on constant-series data)."""
    const = spark.createDataFrame(
        pd.DataFrame(
            {
                SERIES: ["flat"] * 12,
                DS: pd.date_range("2024-01-01", periods=12),
                Y: [3.0] * 12,
            }
        )
    )
    out = P.pacf_frame(const, nlags=4).toPandas().sort_values("lag")
    assert len(out) == 5
    assert out["pacf"].isna().all()  # true NULLs through Arrow
    # mixed corpus: the degenerate series must not poison a good one
    rng = np.random.default_rng(3)
    good = spark.createDataFrame(
        pd.DataFrame(
            {
                SERIES: ["g"] * 30,
                DS: pd.date_range("2024-01-01", periods=30),
                Y: rng.normal(size=30),
            }
        )
    )
    both = P.pacf_frame(const.unionByName(good), nlags=3).toPandas()
    g = both[both[SERIES] == "g"].sort_values("lag")["pacf"]
    assert g.iloc[0] == 1.0 and g.notna().all()
    assert both[both[SERIES] == "flat"]["pacf"].isna().all()


def test_semantic_dedup_warns_on_gemm_downgrade(spark):
    from scalecast_spark.datapipe.cluster import semantic_dedup

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(8)],
            "embedding": [
                [float(i % 2), 1.0 - (i % 2), 0.5] for i in range(8)
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    with pytest.warns(UserWarning, match="gemm"):
        out = semantic_dedup(
            df, k=2, threshold=0.99, id_col="doc_id", method="gemm"
        )
        out.count()
