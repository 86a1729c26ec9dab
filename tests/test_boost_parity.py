"""Requirements-optional parity lane for the boosting cores (round-8
verdict #6): when the REAL xgboost / catboost packages are installed,
assert the numpy cores' split decisions against them on a fixed
fixture and MEASURE prediction fidelity (printed, so the CI log
documents the measured number, not just a pass). In this container
both packages are absent and these legs skip — the same posture as
the statsmodels/PIL gated legs.

Fixture note: the numpy cores consider 9 quantile candidate
thresholds per feature (a histogram-style approximation; real
xgboost's tree_method='exact' sweeps every boundary), so the fixture
puts the dominant split at the median of a uniform feature — a point
both threshold grids contain — making the ROOT split decision
comparable exactly while overall predictions are compared by measured
R² fidelity."""

import numpy as np
import pytest

from scalecast_spark.models.trees import (
    _build_oblivious_tree,
    _build_xgb_tree,
    make_fit_oblivious_gbt,
    make_fit_xgb,
)


def _fixture(n=400, d=4, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, d)
    y = 3.0 * (X[:, 0] > 0.5) + X[:, 1] + 0.05 * rng.randn(n)
    return X, y


def _fidelity(p_ours: np.ndarray, p_real: np.ndarray) -> float:
    resid = p_ours - p_real
    return 1.0 - float(resid.var()) / float(p_real.var())


def test_xgboost_root_split_and_fidelity():
    xgb = pytest.importorskip("xgboost")
    X, y = _fixture()
    # both engines, same hyperparameters (hess=1 squared-error loss,
    # L2 leaf penalty, gain pruning); base_score pinned to y-mean to
    # match the numpy core's base
    ours = make_fit_xgb(
        n_estimators=20, max_depth=3, learning_rate=0.3,
        reg_lambda=1.0, gamma=0.0,
    )(X, y)
    real = xgb.XGBRegressor(
        n_estimators=20, max_depth=3, learning_rate=0.3,
        reg_lambda=1.0, gamma=0.0, min_child_weight=1,
        tree_method="exact", base_score=float(y.mean()),
    )
    real.fit(X, y)
    # split decision: both roots must pick the step feature with a
    # threshold at the step (within one candidate-grid spacing)
    tree0 = _build_xgb_tree(X, y - y.mean(), 0, 3, 1.0, 0.0, 1)
    assert tree0.feature == 0
    tdf = real.get_booster().trees_to_dataframe()
    root = tdf[(tdf["Tree"] == 0) & (tdf["Node"] == 0)].iloc[0]
    assert root["Feature"] in ("f0", "0")
    assert abs(float(tree0.threshold) - float(root["Split"])) < 0.12
    r2 = _fidelity(ours(X), real.predict(X))
    print(f"MEASURED xgboost core fidelity on the fixed fixture: "
          f"R2(ours vs real) = {r2:.4f}")
    assert r2 > 0.95


def test_catboost_level_split_and_fidelity():
    cb = pytest.importorskip("catboost")
    X, y = _fixture()
    ours = make_fit_oblivious_gbt(
        n_estimators=20, max_depth=3, learning_rate=0.3, reg_lambda=1.0,
    )(X, y)
    real = cb.CatBoostRegressor(
        iterations=20, depth=3, learning_rate=0.3, l2_leaf_reg=1.0,
        grow_policy="SymmetricTree", bootstrap_type="No",
        random_strength=0.0, verbose=0, allow_writing_files=False,
    )
    real.fit(X, y)
    # level-0 split decision of the first oblivious tree: the step
    # feature must win the shared-level greedy pick
    tree0 = _build_oblivious_tree(X, y - y.mean(), 3, 1.0)
    assert tree0 is not None
    assert tree0[0][0][0] == 0  # (splits, values); first split feature
    r2 = _fidelity(ours(X), real.predict(X))
    print(f"MEASURED catboost core fidelity on the fixed fixture: "
          f"R2(ours vs real) = {r2:.4f}")
    assert r2 > 0.90


def test_cores_recover_the_step_without_packages():
    """Package-free leg that ALWAYS runs: both numpy cores must find
    the step feature at the median and predict the step levels —
    keeps the parity fixture itself pinned even where the real
    packages are absent."""
    X, y = _fixture()
    for fit in (
        make_fit_xgb(n_estimators=20, max_depth=3, learning_rate=0.3),
        make_fit_oblivious_gbt(
            n_estimators=20, max_depth=3, learning_rate=0.3
        ),
    ):
        pred = fit(X, y)
        lo = pred(np.column_stack([np.full(50, 0.2),
                                   np.full(50, 0.5),
                                   np.full(50, 0.5),
                                   np.full(50, 0.5)]))
        hi = pred(np.column_stack([np.full(50, 0.8),
                                   np.full(50, 0.5),
                                   np.full(50, 0.5),
                                   np.full(50, 0.5)]))
        assert float(hi.mean() - lo.mean()) > 2.0  # step ~3 recovered


# --- round-10 structural pins (round-9 verdict #5): grid-aligned ------
# factorial fixture where every greedy builder's FULL depth-3 structure
# and leaf values are analytically known, so core fidelity is
# structurally certified even where the real packages are absent.

GRID = np.array([0.125, 0.375, 0.625, 0.875])


def _factorial_fixture():
    """Full 4^4 factorial over a symmetric grid with a noise-free
    additive-step target: y = 4*(x0>.5) + 2*(x1>.5) + 1*(x2>.5), x3
    pure noise-feature (zero effect). Effect sizes are strictly
    ordered, so the greedy feature choice at every level is unique
    (no cross-feature gain ties); any threshold separating
    {.125,.375} from {.625,.875} yields the SAME partition, so
    structure is deterministic although the exact threshold value is
    grid-dependent."""
    from itertools import product

    X = np.array(list(product(GRID, GRID, GRID, GRID)))
    y = (
        4.0 * (X[:, 0] > 0.5)
        + 2.0 * (X[:, 1] > 0.5)
        + 1.0 * (X[:, 2] > 0.5)
    )
    return X, y


def _leaf_const(b0, b1, b2):
    return 4.0 * b0 + 2.0 * b1 + 1.0 * b2


def _assert_separating(thr):
    assert 0.375 <= thr < 0.625, thr


def _walk_depth3(root, leaf_value, atol=1e-12):
    """Pin the full depth-3 structure: features 0 -> 1 -> 2 by level,
    every threshold separating the grid halves, and each of the 8
    leaves at its analytic value (leaf_value(b0,b1,b2))."""
    assert root.feature == 0
    _assert_separating(root.threshold)
    for b0, n1 in ((0, root.left), (1, root.right)):
        assert n1.feature == 1, (b0, n1.feature)
        _assert_separating(n1.threshold)
        for b1, n2 in ((0, n1.left), (1, n1.right)):
            assert n2.feature == 2, (b0, b1, n2.feature)
            _assert_separating(n2.threshold)
            for b2, leaf in ((0, n2.left), (1, n2.right)):
                assert leaf.feature is None
                assert abs(leaf.value - leaf_value(b0, b1, b2)) < atol


def test_cart_depth3_structure_and_leaves():
    """CART (_build_tree — the rf/gbt splitter): leaves are exact
    combo means on the noise-free fixture."""
    from scalecast_spark.models.trees import _build_tree

    X, y = _factorial_fixture()
    tree = _build_tree(X, y, 0, 3, 3, None, None)
    _walk_depth3(tree, _leaf_const)


def test_xgb_depth3_structure_and_leaves():
    """XGBoost core (_build_xgb_tree): same structure, leaf weights
    L2-shrunk to G/(n + lambda) = 32*(combo - mean)/33 per Chen &
    Guestrin eq. 5 with hess=1."""
    X, y = _factorial_fixture()
    tree = _build_xgb_tree(X, y - y.mean(), 0, 3, 1.0, 0.0, 1)
    _walk_depth3(
        tree,
        lambda b0, b1, b2: 32.0 * (_leaf_const(b0, b1, b2) - 3.5) / 33.0,
    )


def test_oblivious_depth3_structure_and_leaves():
    """CatBoost-style core (_build_oblivious_tree): one split per
    LEVEL, greedily ordered by effect size (x0 then x1 then x2), leaf
    table at bit-index b0*4+b1*2+b2 holding the L2-shrunk residual
    sum (reg_lambda=1)."""
    X, y = _factorial_fixture()
    tree = _build_oblivious_tree(X, y - y.mean(), 3, 1.0)
    assert tree is not None
    splits, values = tree
    assert [j for j, _ in splits] == [0, 1, 2]
    for _, thr in splits:
        _assert_separating(thr)
    assert len(values) == 8
    for b0 in (0, 1):
        for b1 in (0, 1):
            for b2 in (0, 1):
                want = 32.0 * (_leaf_const(b0, b1, b2) - 3.5) / 33.0
                got = values[b0 * 4 + b1 * 2 + b2]
                assert abs(got - want) < 1e-12, (b0, b1, b2, got, want)


def test_boosted_round_two_residuals_shrink():
    """Second boosting round on the factorial fixture: after one
    shrunken tree, the next tree must fit the REMAINING residual with
    the same structure — pins the residual-update wiring, not just
    single-tree construction."""
    X, y = _factorial_fixture()
    lr = 0.3
    t1 = _build_xgb_tree(X, y - y.mean(), 0, 3, 1.0, 0.0, 1)
    from scalecast_spark.models.trees import _predict_tree

    r2 = (y - y.mean()) - lr * _predict_tree(t1, X)
    t2 = _build_xgb_tree(X, r2, 0, 3, 1.0, 0.0, 1)
    # residual is still the same step function scaled by (1 - lr*32/33)
    shrink = 1.0 - lr * 32.0 / 33.0
    _walk_depth3(
        t2,
        lambda b0, b1, b2: 32.0
        * shrink
        * (_leaf_const(b0, b1, b2) - 3.5)
        / 33.0,
        atol=1e-9,
    )
