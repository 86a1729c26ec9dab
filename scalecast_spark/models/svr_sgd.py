"""SVR and SGD estimators (reference registry names 'svr', 'sgd';
sklearn-backed in the reference, numpy here).

  * svr — epsilon-insensitive SVR trained by subgradient descent on the
    primal objective (C · Σ max(0, |r|-ε) + ||w||²/2). kernel='linear'
    works on the raw design matrix; kernel='rbf' lifts it through
    RANDOM FOURIER FEATURES (Rahimi & Recht 2007: z(x) =
    sqrt(2/D)·cos(Wx + b), W ~ N(0, 2γ)) and runs the SAME linear
    solver in the lifted space — the scale-correct RBF approximation
    (fixed D per fit, no n×n kernel matrix per series).
  * sgd — SGDRegressor equivalent: squared loss + elasticnet penalty,
    mini-batch SGD with inverse-scaling learning rate.

Both plug into the shared recursive kernel like every other estimator.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from scalecast_spark.models.kernel import run_kernel


def make_fit_linear_svr(C: float = 1.0, epsilon: float = 0.1, n_iter: int = 300, lr: float = 0.01, seed: int = 42):
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        n, p = X.shape
        # standardize internally for stable steps; fold back at predict
        xm, xs = X.mean(axis=0), X.std(axis=0)
        xs = np.where(xs > 0, xs, 1.0)
        ym, ys = y.mean(), y.std() or 1.0
        Xs, yt = (X - xm) / xs, (y - ym) / ys
        rng = np.random.RandomState(seed)
        w = np.zeros(p)
        b = 0.0
        lam = 1.0 / (C * n)  # Pegasos scaling: loss is per-sample mean
        for t in range(1, n_iter + 1):
            step = lr / np.sqrt(t)
            resid = Xs @ w + b - yt
            viol = np.abs(resid) > epsilon
            g_data = np.sign(resid) * viol
            gw = lam * w + (Xs.T @ g_data) / n
            gb = float(g_data.mean())
            w -= step * gw
            b -= step * gb

        def predict(A: np.ndarray) -> np.ndarray:
            A = (np.atleast_2d(A).astype(float) - xm) / xs
            return (A @ w + b) * ys + ym

        return predict

    return fit


def make_fit_sgd(alpha: float = 1e-4, l1_ratio: float = 0.15, n_iter: int = 500, lr: float = 0.05, seed: int = 42):
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        n, p = X.shape
        xm, xs = X.mean(axis=0), X.std(axis=0)
        xs = np.where(xs > 0, xs, 1.0)
        ym, ys = y.mean(), y.std() or 1.0
        Xs, yt = (X - xm) / xs, (y - ym) / ys
        rng = np.random.RandomState(seed)
        w = np.zeros(p)
        b = 0.0
        batch = max(min(32, n), 1)
        for t in range(1, n_iter + 1):
            idx = rng.randint(0, n, size=batch)
            resid = Xs[idx] @ w + b - yt[idx]
            step = lr / (1 + lr * alpha * t)
            gw = Xs[idx].T @ resid / batch + alpha * (
                l1_ratio * np.sign(w) + (1 - l1_ratio) * w
            )
            w -= step * gw
            b -= step * float(resid.mean())

        def predict(A: np.ndarray) -> np.ndarray:
            A = (np.atleast_2d(A).astype(float) - xm) / xs
            return (A @ w + b) * ys + ym

        return predict

    return fit


def make_fit_rbf_svr(
    C: float = 1.0, epsilon: float = 0.1, gamma: float | str = "scale",
    rff_dim: int = 64, n_iter: int = 300, lr: float = 0.01, seed: int = 42,
):
    """RBF epsilon-SVR via random Fourier features + the linear
    subgradient solver. gamma='scale' follows the sklearn convention
    1/(p·var) — the features are standardized first, so it reduces to
    1/p."""
    lin = make_fit_linear_svr(C, epsilon, n_iter, lr, seed)

    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        p = X.shape[1]
        xm, xs = X.mean(axis=0), X.std(axis=0)
        xs = np.where(xs > 0, xs, 1.0)
        g = (1.0 / p) if gamma == "scale" else float(gamma)
        rng = np.random.RandomState(seed)
        W = rng.randn(p, rff_dim) * np.sqrt(2.0 * g)
        b0 = rng.uniform(0.0, 2.0 * np.pi, rff_dim)
        scale = np.sqrt(2.0 / rff_dim)

        def lift(A: np.ndarray) -> np.ndarray:
            A = (np.atleast_2d(A).astype(float) - xm) / xs
            return scale * np.cos(A @ W + b0)

        inner = lin(lift(X), y)
        return lambda A: inner(lift(A))

    return fit


def make_fit_svr(
    kernel: str = "rbf", C: float = 1.0, epsilon: float = 0.1,
    gamma: float | str = "scale", rff_dim: int = 64,
):
    """Kernel dispatch matching the reference grids' `kernel` axis
    (sklearn SVR defaults to rbf)."""
    if kernel == "linear":
        return make_fit_linear_svr(C, epsilon)
    if kernel == "rbf":
        return make_fit_rbf_svr(C, epsilon, gamma, rff_dim)
    raise ValueError(f"unsupported SVR kernel {kernel!r} (linear|rbf)")


def svr_model(df: DataFrame, features: list[str], kernel: str = "linear", C: float = 1.0, epsilon: float = 0.1, gamma: float | str = "scale", dynamic_testing=True, normalizer=None) -> DataFrame:
    return run_kernel(df, features, make_fit_svr(kernel, C, epsilon, gamma), dynamic_testing, normalizer)


def sgd_model(df: DataFrame, features: list[str], alpha: float = 1e-4, l1_ratio: float = 0.15, dynamic_testing=True, normalizer=None) -> DataFrame:
    return run_kernel(df, features, make_fit_sgd(alpha, l1_ratio), dynamic_testing, normalizer)
