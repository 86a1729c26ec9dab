"""Numpy implementations of the reference's sklearn estimator family
(reference cfg.py:26-48 registry; wrappers models.py:21-162).

The container has no scikit-learn, so each estimator is a small,
well-known closed form or iteration in numpy, plugged into the shared
recursive kernel (kernel.py). Per-series model fits are tiny (a few
hundred rows × a few features), so driver-free numpy inside
applyInPandas is both exact and fast; MLlib remains the right backend
only when a SINGLE model must be fit across billions of rows.

Estimator list and semantics follow public definitions:
  * mlr — OLS via lstsq
  * ridge — (XᵀX + αI)⁻¹ Xᵀy (intercept unpenalized)
  * lasso / elasticnet — cyclic coordinate descent on the standard
    soft-thresholding update
  * knn — k-nearest-neighbor regression, Euclidean mean
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from scalecast_spark.models.kernel import run_kernel


def _with_icept(X: np.ndarray) -> np.ndarray:
    return np.column_stack([X, np.ones(len(X))])


def fit_ols(X: np.ndarray, y: np.ndarray):
    beta, *_ = np.linalg.lstsq(_with_icept(X), y, rcond=None)
    return lambda A: _with_icept(np.atleast_2d(A)) @ beta


def make_fit_ridge(alpha: float = 1.0):
    def fit(X: np.ndarray, y: np.ndarray):
        Xi = _with_icept(X)
        p = Xi.shape[1]
        pen = alpha * np.eye(p)
        pen[-1, -1] = 0.0  # never penalize the intercept
        beta = np.linalg.solve(Xi.T @ Xi + pen, Xi.T @ y)
        return lambda A: _with_icept(np.atleast_2d(A)) @ beta

    return fit


def make_fit_coordinate_descent(alpha: float = 1.0, l1_ratio: float = 1.0, n_iter: int = 200):
    """Lasso (l1_ratio=1) / elasticnet via cyclic coordinate descent on
    centered data — the textbook soft-threshold update."""

    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        n, p = X.shape
        xm, ym = X.mean(axis=0), y.mean()
        Xc, yc = X - xm, y - ym
        l1 = alpha * l1_ratio * n
        l2 = alpha * (1 - l1_ratio) * n
        beta = np.zeros(p)
        col_ss = (Xc**2).sum(axis=0)
        resid = yc - Xc @ beta
        for _ in range(n_iter):
            max_delta = 0.0
            for j in range(p):
                if col_ss[j] == 0:
                    continue
                rho = Xc[:, j] @ resid + col_ss[j] * beta[j]
                new = np.sign(rho) * max(abs(rho) - l1, 0.0) / (col_ss[j] + l2)
                delta = new - beta[j]
                if delta != 0.0:
                    resid -= Xc[:, j] * delta
                    beta[j] = new
                    max_delta = max(max_delta, abs(delta))
            if max_delta < 1e-10:
                break
        icept = ym - xm @ beta

        return lambda A: np.atleast_2d(A) @ beta + icept

    return fit


def make_fit_knn(n_neighbors: int = 5):
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        k = min(n_neighbors, len(X))

        def predict(A: np.ndarray) -> np.ndarray:
            A = np.atleast_2d(A).astype(float)
            d = ((A[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
            idx = np.argpartition(d, k - 1, axis=1)[:, :k]
            return y[idx].mean(axis=1)

        return predict

    return fit


# ------------------------------------------------- registry adapters


def mlr_model(df: DataFrame, features: list[str], dynamic_testing=True, normalizer=None) -> DataFrame:
    return run_kernel(df, features, fit_ols, dynamic_testing, normalizer)


def ridge_model(df: DataFrame, features: list[str], alpha: float = 1.0, dynamic_testing=True, normalizer="minmax") -> DataFrame:
    return run_kernel(df, features, make_fit_ridge(alpha), dynamic_testing, normalizer)


def lasso_model(df: DataFrame, features: list[str], alpha: float = 1.0, dynamic_testing=True, normalizer="minmax") -> DataFrame:
    return run_kernel(
        df, features, make_fit_coordinate_descent(alpha, 1.0), dynamic_testing, normalizer
    )


def elasticnet_model(df: DataFrame, features: list[str], alpha: float = 1.0, l1_ratio: float = 0.5, dynamic_testing=True, normalizer="minmax") -> DataFrame:
    return run_kernel(
        df, features, make_fit_coordinate_descent(alpha, l1_ratio), dynamic_testing, normalizer
    )


def knn_model(df: DataFrame, features: list[str], n_neighbors: int = 5, dynamic_testing=True, normalizer="minmax") -> DataFrame:
    return run_kernel(df, features, make_fit_knn(n_neighbors), dynamic_testing, normalizer)
