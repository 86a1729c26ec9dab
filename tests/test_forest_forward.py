"""Fixed-structure forest forward passes (models/trees.py
make_fixed_forest_forward) — the deterministic, SQL-restatable gate
members of the tree family (round-9 verdict #2, the network-forward
trick applied to trees). The rf/gbt legs drive the PRODUCTION
_predict_tree (the exact routine the trained rf/gbt/xgboost
estimators call) and the cat leg _predict_oblivious; the DuckDB
replay (_forest_forward_ctes) must agree far inside the 6 dp gate
rounding on the fixture AND off-fixture. Because tree routing is
DISCONTINUOUS (a CASE WHEN boundary), the margin story needs a second
leg the smooth networks didn't: every standardized observation must
sit far from every threshold it is compared against, so a last-ulp
cross-engine difference in mean/stddev can never flip a route."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from scalecast_spark.models.trees import (
    FOREST_FWD_KINDS,
    _predict_oblivious,
    _predict_tree,
    fixed_cart_spec,
    fixed_oblivious_spec,
    make_fixed_forest_forward,
    tree_from_spec,
)

#: COVERAGE.md margin rule: unrounded engine-vs-oracle divergence must
#: clear the 0.5e-6 rounding boundary by >4e3
MARGIN = 0.5e-6 / 4e3

KINDS = tuple(FOREST_FWD_KINDS)


def _oracle_fc(ser: pd.DataFrame) -> pd.DataFrame:
    import __spark_entry__ as e

    con = duckdb.connect()
    con.register("series_src", ser)
    sql = f"""
        WITH series AS (SELECT * FROM series_src),
        steps AS (SELECT unnest(range(1, 8)) AS step),
        {e._networks_forward_ctes()},
        {e._forest_forward_ctes()}
        SELECT 'rf' AS kind, series_id, ds, forecast FROM ff_rf_fc
        UNION ALL
        SELECT 'gbt', series_id, ds, forecast FROM ff_gbt_fc
        UNION ALL
        SELECT 'cat', series_id, ds, forecast FROM ff_cat_fc
    """
    return con.execute(sql).df()


def _compare(ser: pd.DataFrame) -> float:
    odf = _oracle_fc(ser)
    worst = 0.0
    for kind in KINDS:
        model_fn = make_fixed_forest_forward(kind)
        for sid, g in ser.groupby("series_id"):
            y = g.sort_values("ds")["y"].to_numpy(float)
            _, fc = model_fn(y, 7)
            o = (
                odf[(odf.kind == kind) & (odf.series_id == sid)]
                .sort_values("ds")["forecast"]
                .to_numpy(float)
            )
            assert len(o) == 7
            worst = max(worst, float(np.abs(fc - o).max()))
    return worst


def _routing_margin(ser: pd.DataFrame, lags=4, depth=2, n_trees=3) -> float:
    """Min distance from any standardized observation to any threshold
    it is compared against across all fixed trees — the quantity that
    must dominate cross-engine mean/stddev ulp noise for the CASE WHEN
    replay to be hash-stable."""
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
    return worst


def test_forward_pass_matches_oracle_fixture(spark, sf_dir):
    """Engine forest forward vs DuckDB replay on the driver fixture;
    routing must also be ulp-robust (no observation near a split)."""
    import __spark_entry__ as e

    ser = e._series(spark, sf_dir).toPandas()
    ser["ds"] = pd.to_datetime(ser["ds"]).dt.date
    assert _compare(ser) < MARGIN
    assert _routing_margin(ser) > 1e-4


def test_forward_pass_matches_oracle_off_fixture():
    """Off-fixture sweep at level scales 1e0..1e5 (COVERAGE rule)."""
    rng = np.random.RandomState(11)
    rows = []
    for k, scale in enumerate([1.0, 1e2, 1e5]):
        for s in range(3):
            y = np.cumsum(rng.randn(40)) * scale + scale
            for i, v in enumerate(y):
                rows.append(
                    {
                        "series_id": f"s{k}_{s}",
                        "ds": (
                            pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
                        ).date(),
                        "y": float(v),
                    }
                )
    ser = pd.DataFrame(rows)
    assert _compare(ser) < 1e-7
    assert _routing_margin(ser) > 1e-6


def test_routing_is_data_dependent():
    """Different series must land in different leaves — a threshold
    grid outside the standardized data range would make every CASE
    WHEN collapse to one arm and certify nothing. Two series with
    opposite recent shapes must disagree on at least one tree route."""
    rng = np.random.RandomState(3)
    leaves_seen = set()
    for s in range(1, 8):
        for t in range(3):
            feats, thrs, leaves = fixed_cart_spec(s, t)
            tree = tree_from_spec(feats, thrs, leaves, 2)
            for trial in range(6):
                a = rng.randn(1, 4)
                leaves_seen.add(
                    (s, t, float(_predict_tree(tree, a)[0]))
                )
    # 7 steps x 3 trees x 6 random windows: if routing ignored the
    # data every (s, t) would contribute exactly one leaf
    assert len(leaves_seen) > 7 * 3


def test_production_predictors_are_the_code_under_test():
    """The members must route through _predict_tree /
    _predict_oblivious — guard against drifting onto a private
    reimplementation."""
    y = np.cumsum(np.random.RandomState(0).randn(30)) + 50.0
    xmu, xsd = y.mean(), y.std()
    A = (y[None, -4:] - xmu) / xsd
    for kind, (salt, lr) in FOREST_FWD_KINDS.items():
        want = np.empty(7)
        for s in range(1, 8):
            if kind == "cat":
                z = sum(
                    lr * _predict_oblivious(fixed_oblivious_spec(s, t), A)[0]
                    for t in range(3)
                )
            else:
                preds = [
                    _predict_tree(
                        tree_from_spec(*fixed_cart_spec(s, t, salt=salt), 2),
                        A,
                    )[0]
                    for t in range(3)
                ]
                z = float(np.mean(preds)) if kind == "rf" else lr * sum(preds)
            want[s - 1] = z * xsd + xmu
        _, fc = make_fixed_forest_forward(kind)(y, 7)
        assert np.allclose(fc, want, atol=0, rtol=0)


def test_members_are_distinct():
    """The three members must not collapse onto each other (distinct
    salts/kernels) — identical outputs would triple-count one
    certification."""
    y = np.cumsum(np.random.RandomState(5).randn(35)) + 20.0
    fcs = {k: make_fixed_forest_forward(k)(y, 7)[1] for k in KINDS}
    for a in KINDS:
        for b in KINDS:
            if a < b:
                assert not np.allclose(fcs[a], fcs[b])


def test_short_series_flatline():
    _, fc = make_fixed_forest_forward("rf")(np.array([3.0, 4.0]), 5)
    assert (fc == 4.0).all()


def test_bad_kind_raises():
    with pytest.raises(ValueError, match="kind must be"):
        make_fixed_forest_forward("dart")
