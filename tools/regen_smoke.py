"""Testdata-regen smoke: the checks a NEW testdata generation (or a
tools/synth_sf.py corpus) must pass before the oracle gate can be
trusted on it (FIXTURES.md "Regen contract"; r10 verdict #7).

Two classes of guard:

1. DISCONTINUOUS decision margins — places where the gate's
   engine-vs-oracle agreement rides on a decision that a last-ulp
   cross-engine difference could flip. Rounded-value checks only fail
   AFTER the flip; these margins fail BEFORE it:
     * forest-forward routing (tests/test_forest_forward.py): every
       standardized observation must sit > 1e-4 from every fixed-tree
       threshold it is compared against;
     * auto_Xvar_select staged decisions (__spark_entry__._axs_member):
       every adjacent candidate-score pair must differ by > 1e-4 and
       the pinned decision directions must hold (ar_1 wins the sweep,
       seasonal accepted, AR accepted).

2. The full oracle gate itself (tools/oracle_check.py) — catches the
   continuous failure modes (a 6dp straddle like the round-8 raw-scale
   ridge Gram would fail here outright).

Usage: python tools/regen_smoke.py [sf_dir]   # exit 0 = safe to adopt
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def forest_routing_margin(ser: pd.DataFrame, lags=4, depth=2, n_trees=3) -> float:
    """Min |standardized observation − threshold| across every fixed
    tree/oblivious spec (same quantity as
    tests/test_forest_forward._routing_margin)."""
    from scalecast_spark.models.trees import (
        fixed_cart_spec,
        fixed_oblivious_spec,
    )

    thr_by_feat = {j: set() for j in range(lags)}
    for s in range(1, 8):
        for t in range(n_trees):
            for salt in (0.0, 5.0):
                feats, thrs, _ = fixed_cart_spec(s, t, lags, depth, salt)
                for j, thr in zip(feats, thrs):
                    thr_by_feat[j].add(thr)
            for j, thr in fixed_oblivious_spec(s, t, lags, depth)[0]:
                thr_by_feat[j].add(thr)
    worst = np.inf
    for _, g in ser.groupby("series_id"):
        y = g.sort_values("ds")["y"].to_numpy(float)
        a = (y[-lags:] - y.mean()) / (y.std() or 1.0)
        for j in range(lags):
            for thr in thr_by_feat[j]:
                worst = min(worst, abs(a[j] - thr))
    return float(worst)


def axs_margins(spark, sf_dir: str):
    """Run the auto_Xvar_select fixture search and return the staged
    decision margins + whether the pinned directions hold."""
    import __spark_entry__ as e
    from scalecast_spark.forecaster import Forecaster
    from scalecast_spark.selection import auto_Xvar_select

    f = Forecaster(e._axs_fixture(spark, sf_dir), future_dates=7)
    f.add_ar_terms(2).add_time_trend().add_seasonal_regressors(
        "dayofweek", raw=True
    )
    f.set_validation_length(7)
    auto_Xvar_select(f, estimator="mlr", max_ar=2)
    s = [v for _, v in f.axs_trajectory]
    assert len(s) == 5, f"expected 5 candidates, saw {len(s)}"
    margins = {
        "sweep |s_ar1 - s_ar12|": abs(s[0] - s[1]),
        "seasonal |s_t - s_tdow|": abs(s[2] - s[3]),
        "ar-accept |s_tdow - s_full|": abs(s[3] - s[4]),
    }
    pinned = s[0] <= s[1] and s[3] < s[2] and s[4] < s[3]
    return margins, pinned


def rxv_margins(spark, sf_dir: str):
    """Run the reduce_Xvars(shap) fixture search and return its
    decision margins + whether the pinned directions hold (junk ranks
    least important, the junk drop improves, the t drop degrades)."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W
    from scalecast_spark.forecaster import Forecaster
    from scalecast_spark.operators.xvars import ingest_Xvars_df
    from scalecast_spark.selection import reduce_Xvars

    f = Forecaster(e._axs_fixture(spark, sf_dir), future_dates=7)
    f.add_time_trend().add_seasonal_regressors("dayofweek", raw=True)
    xdf = e._axs_fixture(spark, sf_dir).select(
        "ds",
        (F.row_number().over(W.orderBy("ds"))
         * F.row_number().over(W.orderBy("ds")) / 100.0)
        .cast("double").alias("junk"),
    )
    df2, names = ingest_Xvars_df(f.tsf.df, xdf)
    f.tsf = f.tsf.with_features(df2, names)
    f.set_validation_length(7)
    reduce_Xvars(f, estimator="mlr", method="shap")
    imp = f.rxv_importances
    s = [v for _, v in f.rxv_trajectory]
    assert len(s) == 3, f"expected 3 evaluated candidates, saw {len(s)}"
    margins = {
        "rank |imp_junk - next|": min(imp["t"], imp["dayofweek"])
        - imp["junk"],
        "rank |imp_t - imp_dayofweek|": abs(imp["t"] - imp["dayofweek"]),
        "drop-accept |s_full - s_nojunk|": abs(s[0] - s[1]),
        "drop-reject |s_nojunk - s_next|": abs(s[1] - s[2]),
    }
    # either second-attempt branch (drop t / drop dayofweek) is fine —
    # the oracle replays both; what must hold: junk ranks least, the
    # junk drop does not degrade, the follow-up drop degrades
    pinned = (
        imp["junk"] < min(imp["t"], imp["dayofweek"])
        and s[1] <= s[0]
        and s[2] > s[1]
    )
    return margins, pinned


def dbsl_margins(spark, sf_dir: str):
    """Run the determine_best_series_length structural-break fixture
    and return the winner's margin over the runner-up + whether the
    post-break window (L=15) wins."""
    import __spark_entry__ as e

    got = {
        r["series_id"]: r["forecast"]
        for r in e._dbsl_member(spark, sf_dir)
        .filter("model = 'dbsl_cand'").collect()
    }
    scores = sorted(got.values())
    picked = (
        e._dbsl_member(spark, sf_dir)
        .filter("model = 'dbsl_pick'").collect()[0]["series_id"]
    )
    return {"winner margin": scores[1] - scores[0]}, picked == "15"


def qmodel_round_margin(sf_dir: str) -> float:
    """Min distance (in 1e-6 grid units) of any doc's UNROUNDED
    quality-classifier score from a 6dp rounding boundary. The
    text_analysis q_model_score member rounds sigmoid output to 6dp on
    both engines; their libm exp can differ in the last ulp (~1e-16),
    so a score sitting within ~1e-10 grid units of a .5 boundary could
    round apart. Replays the exact md5-bucket chain in pure Python
    (same replay as tests/test_quality_model.py)."""
    import hashlib
    import math

    import duckdb

    import __spark_entry__ as e

    nf = e.QM_N_FEATURES
    w, b = e.QM_WEIGHTS[:-1], e.QM_WEIGHTS[-1]
    texts = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    worst = np.inf
    for (text,) in texts:
        words = [x for x in " ".join((text or "").lower().split()).split(" ")
                 if x]
        toks = words + [f"{a} {bb}" for a, bb in zip(words, words[1:])]
        dot = b + (
            sum(
                w[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % nf]
                for t in toks
            ) / len(toks)
            if toks else 0.0
        )
        frac = (1.0 / (1.0 + math.exp(-dot))) * 1e6 % 1.0
        worst = min(worst, abs(frac - 0.5))
    return worst


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from scalecast_spark import get_session

    spark = get_session("regen-smoke")
    import __spark_entry__ as e

    failures = []

    ser = e._series(spark, sf_dir).toPandas()
    ser["ds"] = pd.to_datetime(ser["ds"]).dt.date
    m = forest_routing_margin(ser)
    print(f"forest-forward routing margin: {m:.3e} (need > 1e-4)")
    if m <= 1e-4:
        failures.append(
            "forest routing margin too thin — an observation sits near a "
            "fixed-tree threshold; regenerate with a different seed or "
            "adjust fixed_cart_spec salts"
        )

    margins, pinned = axs_margins(spark, sf_dir)
    for k, v in margins.items():
        print(f"axs decision margin {k}: {v:.3e} (need > 1e-4)")
        if v <= 1e-4:
            failures.append(f"axs margin {k} too thin")
    print(f"axs pinned decision directions hold: {pinned}")
    if not pinned:
        failures.append(
            "axs pinned decisions flipped (oracle arms guard on "
            "s_ar1<=s_ar12, s_tdow<s_t, s_full<s_tdow) — the fixture "
            "formula in _axs_fixture needs retuning for this spine"
        )

    margins, pinned = rxv_margins(spark, sf_dir)
    for k, v in margins.items():
        print(f"rxv decision margin {k}: {v:.3e} (need > 1e-4)")
        if v <= 1e-4:
            failures.append(f"rxv margin {k} too thin")
    print(f"rxv pinned decision directions hold: {pinned}")
    if not pinned:
        failures.append(
            "rxv pinned decisions flipped (oracle arms guard on the "
            "junk-least-important ranking, r2<=r1, r3>r2) — retune the "
            "junk formula in __spark_entry__._rxv_member"
        )

    margins, pinned = dbsl_margins(spark, sf_dir)
    for k, v in margins.items():
        print(f"dbsl decision margin {k}: {v:.3e} (need > 1e-4)")
        if v <= 1e-4:
            failures.append(f"dbsl margin {k} too thin")
    print(f"dbsl pinned decision (L=15 wins) holds: {pinned}")
    if not pinned:
        failures.append(
            "dbsl pinned decision flipped — the structural-break "
            "fixture in _dbsl_member no longer favors the post-break "
            "window; retune the break offset/slopes"
        )

    # MV searches (varlag_* / coint_* members of mv_corr): argmin and
    # threshold margins
    mv = {
        (r["series_a"], r["series_b"]): r["corr"]
        for r in e._varlag_member(spark, sf_dir).collect()
    }
    aics = sorted(v for (a, _), v in mv.items() if a == "varlag_aic")
    bics = sorted(v for (a, _), v in mv.items() if a == "varlag_bic")
    co = {
        (r["series_a"], r["series_b"]): r["corr"]
        for r in e._coint_member(spark, sf_dir).collect()
    }
    mv_margins = {
        "varlag AIC winner": aics[1] - aics[0],
        "varlag BIC winner": bics[1] - bics[0],
        "coint trace0 vs crit": abs(co[("coint_trace", "0")] - 15.41),
        "coint trace1 vs crit": abs(co[("coint_trace", "1")] - 3.76),
    }
    for k, v in mv_margins.items():
        print(f"mv-search decision margin {k}: {v:.3e} (need > 1e-4)")
        if v <= 1e-4:
            failures.append(f"mv-search margin {k} too thin")

    qm = qmodel_round_margin(sf_dir)
    print(f"qmodel 6dp rounding margin: {qm:.3e} grid units (need > 1e-6)")
    if qm <= 1e-6:
        failures.append(
            "a quality-classifier score sits on a 6dp rounding boundary "
            "— cross-engine exp ulp could round it apart; nudge "
            "QM_WEIGHTS' bias in __spark_entry__"
        )

    print("\nrunning the full oracle gate ...")
    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "oracle_check.py"), sf_dir]
    )
    if rc != 0:
        failures.append("oracle_check gate failed")

    if failures:
        print("\nREGEN SMOKE FAILED:")
        for f_ in failures:
            print(f"  - {f_}")
        sys.exit(1)
    print("\nregen smoke passed — corpus safe to adopt")


if __name__ == "__main__":
    main()
