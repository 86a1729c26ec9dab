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
