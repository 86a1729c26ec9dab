"""Tree-ensemble estimators in numpy (reference registry names 'rf',
'gbt', 'xgboost'; wrappers models.py:21-162 over sklearn/xgboost).

The container has no sklearn/xgboost, so the standard algorithms are
implemented directly: CART regression trees (variance-reduction splits
over quantile candidate thresholds), gradient boosting (least-squares
boosting with shrinkage), and random forest (bootstrap bagging +
feature subsampling, deterministic seeding). Each model fits ONE series
inside the shared kernel — a few hundred rows × few features — where a
vectorized numpy CART is plenty fast; scale comes from series-parallel
fan-out, not single-model distribution.

``xgboost`` runs a dedicated second-order regularized booster
(make_fit_xgb) and ``catboost`` an oblivious-tree booster
(make_fit_oblivious_gbt); when the real packages are installed their
regressors are used instead (import-gated in xgboost_model /
catboost_model).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from scalecast_spark.models.kernel import run_kernel


class _Tree:
    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self, value=None):
        self.feature = None
        self.threshold = None
        self.left = None
        self.right = None
        self.value = value


def _build_tree(
    X: np.ndarray, y: np.ndarray, depth: int, max_depth: int,
    min_leaf: int, rng: np.random.RandomState | None, max_features: int | None,
) -> _Tree:
    node = _Tree(value=float(y.mean()))
    if depth >= max_depth or len(y) < 2 * min_leaf or np.ptp(y) == 0:
        return node
    n, p = X.shape
    feats = (
        rng.choice(p, size=max_features, replace=False)
        if (rng is not None and max_features and max_features < p)
        else range(p)
    )
    base_sse = float(((y - y.mean()) ** 2).sum())
    best = (0.0, None, None)
    for j in feats:
        col = X[:, j]
        # candidate thresholds at quantiles — O(n log n) per feature
        qs = np.unique(np.quantile(col, np.linspace(0.1, 0.9, 9)))
        for thr in qs:
            mask = col <= thr
            nl = int(mask.sum())
            if nl < min_leaf or n - nl < min_leaf:
                continue
            yl, yr = y[mask], y[~mask]
            sse = float(((yl - yl.mean()) ** 2).sum() + ((yr - yr.mean()) ** 2).sum())
            gain = base_sse - sse
            if gain > best[0]:
                best = (gain, j, thr)
    if best[1] is None:
        return node
    _, j, thr = best
    mask = X[:, j] <= thr
    node.feature, node.threshold = int(j), float(thr)
    node.left = _build_tree(X[mask], y[mask], depth + 1, max_depth, min_leaf, rng, max_features)
    node.right = _build_tree(X[~mask], y[~mask], depth + 1, max_depth, min_leaf, rng, max_features)
    return node


def _predict_tree(node: _Tree, X: np.ndarray) -> np.ndarray:
    if node.feature is None:
        return np.full(len(X), node.value)
    mask = X[:, node.feature] <= node.threshold
    out = np.empty(len(X))
    if mask.any():
        out[mask] = _predict_tree(node.left, X[mask])
    if (~mask).any():
        out[~mask] = _predict_tree(node.right, X[~mask])
    return out


def make_fit_gbt(
    n_estimators: int = 50, max_depth: int = 3, learning_rate: float = 0.1,
    min_leaf: int = 3,
):
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        base = float(y.mean())
        resid = y - base
        trees = []
        for _ in range(n_estimators):
            t = _build_tree(X, resid, 0, max_depth, min_leaf, None, None)
            pred = _predict_tree(t, X)
            resid = resid - learning_rate * pred
            trees.append(t)

        def predict(A: np.ndarray) -> np.ndarray:
            A = np.atleast_2d(A).astype(float)
            out = np.full(len(A), base)
            for t in trees:
                out += learning_rate * _predict_tree(t, A)
            return out

        return predict

    return fit


def make_fit_rf(
    n_estimators: int = 50, max_depth: int = 6, min_leaf: int = 2,
    random_state: int = 42,
):
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        n, p = X.shape
        rng = np.random.RandomState(random_state)
        max_features = max(1, p // 3)
        trees = []
        for _ in range(n_estimators):
            idx = rng.randint(0, n, size=n)
            trees.append(
                _build_tree(X[idx], y[idx], 0, max_depth, min_leaf, rng, max_features)
            )

        def predict(A: np.ndarray) -> np.ndarray:
            A = np.atleast_2d(A).astype(float)
            return np.mean([_predict_tree(t, A) for t in trees], axis=0)

        return predict

    return fit


def gbt_model(df: DataFrame, features: list[str], n_estimators: int = 50,
              max_depth: int = 3, learning_rate: float = 0.1,
              dynamic_testing=True, normalizer=None) -> DataFrame:
    return run_kernel(
        df, features, make_fit_gbt(n_estimators, max_depth, learning_rate),
        dynamic_testing, normalizer,
    )


def rf_model(df: DataFrame, features: list[str], n_estimators: int = 50,
             max_depth: int = 6, random_state: int = 42,
             dynamic_testing=True, normalizer=None) -> DataFrame:
    return run_kernel(
        df, features, make_fit_rf(n_estimators, max_depth, random_state=random_state),
        dynamic_testing, normalizer,
    )


def _build_xgb_tree(
    X: np.ndarray, r: np.ndarray, depth: int, max_depth: int,
    reg_lambda: float, gamma: float, min_child: int,
) -> _Tree:
    """XGBoost-style tree for squared-error loss (Chen & Guestrin 2016,
    eqs. 6-7): with hess=1 per row, leaf weight = G/(n + lambda) and
    split gain = 1/2 [G_L^2/(n_L+lam) + G_R^2/(n_R+lam) - G^2/(n+lam)]
    - gamma. (G = sum of residuals = -sum of gradients; sign folded.)"""
    n = len(r)
    G = float(r.sum())
    node = _Tree(value=G / (n + reg_lambda))
    if depth >= max_depth or n < 2 * min_child:
        return node
    parent_score = G * G / (n + reg_lambda)
    best = (0.0, None, None)
    for j in range(X.shape[1]):
        col = X[:, j]
        qs = np.unique(np.quantile(col, np.linspace(0.1, 0.9, 9)))
        for thr in qs:
            mask = col <= thr
            nl = int(mask.sum())
            if nl < min_child or n - nl < min_child:
                continue
            GL = float(r[mask].sum())
            GR = G - GL
            gain = 0.5 * (
                GL * GL / (nl + reg_lambda)
                + GR * GR / (n - nl + reg_lambda)
                - parent_score
            ) - gamma
            if gain > best[0]:
                best = (gain, j, thr)
    if best[1] is None:
        return node
    _, j, thr = best
    mask = X[:, j] <= thr
    node.feature, node.threshold = int(j), float(thr)
    node.left = _build_xgb_tree(
        X[mask], r[mask], depth + 1, max_depth, reg_lambda, gamma, min_child
    )
    node.right = _build_xgb_tree(
        X[~mask], r[~mask], depth + 1, max_depth, reg_lambda, gamma, min_child
    )
    return node


def make_fit_xgb(
    n_estimators: int = 50, max_depth: int = 3, learning_rate: float = 0.1,
    reg_lambda: float = 1.0, gamma: float = 0.0, min_child_weight: int = 1,
):
    """Second-order regularized boosting — the actual xgboost update
    rule for reg:squarederror (L2 leaf penalty, gain-pruned splits) —
    not plain least-squares GBT."""
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        base = float(y.mean())
        pred = np.full(len(y), base)
        trees = []
        for _ in range(n_estimators):
            t = _build_xgb_tree(
                X, y - pred, 0, max_depth, reg_lambda, gamma, min_child_weight
            )
            pred = pred + learning_rate * _predict_tree(t, X)
            trees.append(t)

        def predict(A: np.ndarray) -> np.ndarray:
            A = np.atleast_2d(A).astype(float)
            out = np.full(len(A), base)
            for t in trees:
                out += learning_rate * _predict_tree(t, A)
            return out

        return predict

    return fit


def _build_oblivious_tree(
    X: np.ndarray, r: np.ndarray, max_depth: int, reg_lambda: float,
) -> list[tuple[int, float]] | None:
    """CatBoost-style OBLIVIOUS tree: one (feature, threshold) per
    LEVEL, shared by every node at that level, so the tree is a 2^depth
    table indexed by the binary split vector. Each level greedily picks
    the split maximizing the regularized score summed over all current
    leaves."""
    n = len(r)
    leaf_idx = np.zeros(n, dtype=int)
    splits: list[tuple[int, float]] = []
    for _level in range(max_depth):
        best = (0.0, None, None)
        n_leaves = 1 << len(splits)
        base_score = 0.0
        for li in range(n_leaves):
            rl = r[leaf_idx == li]
            if len(rl):
                base_score += float(rl.sum()) ** 2 / (len(rl) + reg_lambda)
        for j in range(X.shape[1]):
            col = X[:, j]
            qs = np.unique(np.quantile(col, np.linspace(0.1, 0.9, 9)))
            for thr in qs:
                mask = col <= thr
                score = 0.0
                for li in range(n_leaves):
                    sel = leaf_idx == li
                    rl, rr = r[sel & mask], r[sel & ~mask]
                    if len(rl):
                        score += float(rl.sum()) ** 2 / (len(rl) + reg_lambda)
                    if len(rr):
                        score += float(rr.sum()) ** 2 / (len(rr) + reg_lambda)
                if score - base_score > best[0]:
                    best = (score - base_score, j, thr)
        if best[1] is None:
            break
        _, j, thr = best
        leaf_idx = leaf_idx * 2 + (X[:, j] > thr).astype(int)
        splits.append((int(j), float(thr)))
    if not splits:
        return None
    n_leaves = 1 << len(splits)
    values = np.zeros(n_leaves)
    for li in range(n_leaves):
        rl = r[leaf_idx == li]
        values[li] = float(rl.sum()) / (len(rl) + reg_lambda) if len(rl) else 0.0
    return [splits, values]  # type: ignore[list-item]


def _predict_oblivious(tree, X: np.ndarray) -> np.ndarray:
    if tree is None:
        return np.zeros(len(X))
    splits, values = tree
    idx = np.zeros(len(X), dtype=int)
    for j, thr in splits:
        idx = idx * 2 + (X[:, j] > thr).astype(int)
    return values[idx]


def make_fit_oblivious_gbt(
    n_estimators: int = 50, max_depth: int = 3, learning_rate: float = 0.1,
    reg_lambda: float = 1.0,
):
    """CatBoost-style booster: symmetric (oblivious) trees with L2 leaf
    regularization under least-squares boosting. Ordered boosting /
    target statistics do not apply (no categorical features in the
    numeric kernel)."""
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        base = float(y.mean())
        pred = np.full(len(y), base)
        trees = []
        for _ in range(n_estimators):
            t = _build_oblivious_tree(X, y - pred, max_depth, reg_lambda)
            pred = pred + learning_rate * _predict_oblivious(t, X)
            trees.append(t)

        def predict(A: np.ndarray) -> np.ndarray:
            A = np.atleast_2d(A).astype(float)
            out = np.full(len(A), base)
            for t in trees:
                out += learning_rate * _predict_oblivious(t, A)
            return out

        return predict

    return fit


def xgboost_model(df: DataFrame, features: list[str], n_estimators: int = 50,
                  max_depth: int = 3, learning_rate: float = 0.1,
                  reg_lambda: float = 1.0, gamma: float = 0.0,
                  dynamic_testing=True, normalizer=None) -> DataFrame:
    """Reference 'xgboost' (models.py xgboost extras): second-order
    regularized boosting. The REAL xgboost regressor is used when the
    package is installed (import-gated; absent from this container —
    the numpy core implements the same update rule)."""
    try:  # pragma: no cover - env-dependent
        from xgboost import XGBRegressor

        def fit_real(X, y):
            model = XGBRegressor(
                n_estimators=n_estimators, max_depth=max_depth,
                learning_rate=learning_rate, reg_lambda=reg_lambda,
                gamma=gamma, random_state=42,
            )
            model.fit(np.atleast_2d(X), y)
            return lambda A: model.predict(np.atleast_2d(A))

        return run_kernel(df, features, fit_real, dynamic_testing, normalizer)
    except ImportError:
        pass
    return run_kernel(
        df, features,
        make_fit_xgb(n_estimators, max_depth, learning_rate, reg_lambda, gamma),
        dynamic_testing, normalizer,
    )


def catboost_model(df: DataFrame, features: list[str], n_estimators: int = 50,
                   max_depth: int = 3, learning_rate: float = 0.1,
                   reg_lambda: float = 1.0,
                   dynamic_testing=True, normalizer=None) -> DataFrame:
    """Reference 'catboost': oblivious-tree booster with L2 leaf
    regularization. The REAL catboost regressor is used when installed
    (import-gated; absent here)."""
    try:  # pragma: no cover - env-dependent
        from catboost import CatBoostRegressor

        def fit_real(X, y):
            model = CatBoostRegressor(
                iterations=n_estimators, depth=max_depth,
                learning_rate=learning_rate, l2_leaf_reg=reg_lambda,
                random_seed=42, verbose=False,
            )
            model.fit(np.atleast_2d(X), y)
            return lambda A: model.predict(np.atleast_2d(A))

        return run_kernel(df, features, fit_real, dynamic_testing, normalizer)
    except ImportError:
        pass
    return run_kernel(
        df, features,
        make_fit_oblivious_gbt(n_estimators, max_depth, learning_rate, reg_lambda),
        dynamic_testing, normalizer,
    )
