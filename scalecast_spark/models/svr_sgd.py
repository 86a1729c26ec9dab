"""SVR and SGD estimators (reference registry names 'svr', 'sgd';
sklearn-backed in the reference, numpy here).

  * svr — linear epsilon-insensitive SVR trained by subgradient descent
    on the primal objective (C · Σ max(0, |r|-ε) + ||w||²/2). Linear
    kernel only (the common case for small tabular design matrices);
    RBF would need a kernel matrix per series — round-2 if demanded.
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


def svr_model(df: DataFrame, features: list[str], C: float = 1.0, epsilon: float = 0.1, dynamic_testing=True, normalizer=None) -> DataFrame:
    return run_kernel(df, features, make_fit_linear_svr(C, epsilon), dynamic_testing, normalizer)


def sgd_model(df: DataFrame, features: list[str], alpha: float = 1e-4, l1_ratio: float = 0.15, dynamic_testing=True, normalizer=None) -> DataFrame:
    return run_kernel(df, features, make_fit_sgd(alpha, l1_ratio), dynamic_testing, normalizer)
