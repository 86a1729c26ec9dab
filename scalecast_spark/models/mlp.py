"""Single-hidden-layer MLP regressor in numpy (reference 'mlp' via
sklearn MLPRegressor, cfg.py:26-48; the TF-backed 'rnn'/'lstm'
estimators, models.py:561-878, are import-gated stubs since the
container has no TensorFlow).

Full-batch Adam on MSE with tanh hidden units — deterministic seeding,
fits a few-hundred-row series in milliseconds inside the shared kernel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from scalecast_spark.models.kernel import run_kernel


def make_fit_mlp(
    hidden: int = 16, epochs: int = 400, lr: float = 0.01, seed: int = 42,
):
    def fit(X: np.ndarray, y: np.ndarray):
        X = np.atleast_2d(X).astype(float)
        rng = np.random.RandomState(seed)
        n, p = X.shape
        ymu, ysd = y.mean(), y.std() or 1.0
        yt = (y - ymu) / ysd
        W1 = rng.randn(p, hidden) * np.sqrt(1.0 / max(p, 1))
        b1 = np.zeros(hidden)
        W2 = rng.randn(hidden) * np.sqrt(1.0 / hidden)
        b2 = 0.0
        params = [W1, b1, W2]
        m = [np.zeros_like(q) for q in params] + [0.0]
        v = [np.zeros_like(q) for q in params] + [0.0]
        beta1, beta2, eps = 0.9, 0.999, 1e-8
        for t in range(1, epochs + 1):
            H = np.tanh(X @ W1 + b1)
            pred = H @ W2 + b2
            err = pred - yt
            gW2 = H.T @ err / n
            gb2 = float(err.mean())
            dH = np.outer(err, W2) * (1 - H**2)
            gW1 = X.T @ dH / n
            gb1 = dH.mean(axis=0)
            grads = [gW1, gb1, gW2, gb2]
            for i, (g, q) in enumerate(zip(grads, [W1, b1, W2, b2])):
                m[i] = beta1 * m[i] + (1 - beta1) * g
                v[i] = beta2 * v[i] + (1 - beta2) * (g * g if i < 3 else g**2)
                mh = m[i] / (1 - beta1**t)
                vh = v[i] / (1 - beta2**t)
                upd = lr * mh / (np.sqrt(vh) + eps)
                if i == 0:
                    W1 -= upd
                elif i == 1:
                    b1 -= upd
                elif i == 2:
                    W2 -= upd
                else:
                    b2 -= upd

        def predict(A: np.ndarray) -> np.ndarray:
            A = np.atleast_2d(A).astype(float)
            return (np.tanh(A @ W1 + b1) @ W2 + b2) * ysd + ymu

        return predict

    return fit


def mlp_model(df: DataFrame, features: list[str], hidden: int = 16,
              epochs: int = 400, lr: float = 0.01,
              dynamic_testing=True, normalizer="minmax") -> DataFrame:
    return run_kernel(
        df, features, make_fit_mlp(hidden, epochs, lr), dynamic_testing, normalizer
    )


def rnn_model(df: DataFrame, features=None, **kwargs) -> DataFrame:
    """Reference 'rnn' (TF Keras SimpleRNN/LSTM, models.py:561-816).
    Requires TensorFlow — not present in this container."""
    try:
        import tensorflow  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "rnn/lstm need TensorFlow; install it or use 'mlp' with AR "
            "features (the sliding-window equivalent)"
        ) from e
    raise NotImplementedError("TF backend wiring lands when TF is available")
