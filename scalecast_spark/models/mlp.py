"""Single-hidden-layer MLP regressor in numpy (reference 'mlp' via
sklearn MLPRegressor, cfg.py:26-48), plus the DIRECT multi-horizon
network standing in for the TF-backed 'rnn'/'lstm' estimators
(models.py:561-878): same sliding-window input/target matrices
(models.py:651-671), H outputs predicted in one forward pass.

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


def sliding_windows(y: np.ndarray, lags: int, horizon: int):
    """The reference's RNN input/target matrices (models.py:651-671):
    row i has inputs y[i:i+lags] and targets y[i+lags:i+lags+horizon].
    Returns (X (rows, lags), T (rows, horizon))."""
    y = np.asarray(y, dtype=float)
    rows = len(y) - lags - horizon + 1
    if rows <= 0:
        return np.empty((0, lags)), np.empty((0, horizon))
    idx = np.arange(lags)[None, :] + np.arange(rows)[:, None]
    tdx = np.arange(horizon)[None, :] + lags + np.arange(rows)[:, None]
    return y[idx], y[tdx]


def make_direct_mlp(
    lags: int = 7, hidden: int = 16, epochs: int = 400, lr: float = 0.01,
    seed: int = 42,
):
    """DIRECT multi-horizon strategy (the reference rnn/lstm's
    non-recursive prediction, models.py:651-671 + 760-816): ONE network
    with ``horizon`` outputs maps the last ``lags`` observations to the
    whole forecast path — no error compounding across steps, unlike the
    recursive kernel. Returns a ``model_fn(y, h)`` for
    run_series_kernel."""

    def model_fn(y: np.ndarray, h: int):
        y = np.asarray(y, dtype=float)
        n = len(y)
        fitted = np.full(n, np.nan)
        H = max(h, 1)
        L = max(1, min(lags, n - H - 1))
        X, T = sliding_windows(y, L, H)
        if len(X) < 2:  # degenerate series: flat-line
            return fitted, np.full(h, y[-1] if n else np.nan)
        rng = np.random.RandomState(seed)
        xmu, xsd = y.mean(), y.std() or 1.0
        Xs, Ts = (X - xmu) / xsd, (T - xmu) / xsd
        rows, p = Xs.shape
        W1 = rng.randn(p, hidden) * np.sqrt(1.0 / p)
        b1 = np.zeros(hidden)
        W2 = rng.randn(hidden, H) * np.sqrt(1.0 / hidden)
        b2 = np.zeros(H)
        mom = [np.zeros_like(q) for q in (W1, b1, W2, b2)]
        vel = [np.zeros_like(q) for q in (W1, b1, W2, b2)]
        beta1, beta2, eps = 0.9, 0.999, 1e-8
        for t in range(1, epochs + 1):
            Hid = np.tanh(Xs @ W1 + b1)
            err = (Hid @ W2 + b2) - Ts  # (rows, H)
            gW2 = Hid.T @ err / rows
            gb2 = err.mean(axis=0)
            dH = (err @ W2.T) * (1 - Hid**2)
            gW1 = Xs.T @ dH / rows
            gb1 = dH.mean(axis=0)
            params = [W1, b1, W2, b2]
            for i, g in enumerate([gW1, gb1, gW2, gb2]):
                mom[i] = beta1 * mom[i] + (1 - beta1) * g
                vel[i] = beta2 * vel[i] + (1 - beta2) * g * g
                mh = mom[i] / (1 - beta1**t)
                vh = vel[i] / (1 - beta2**t)
                params[i] -= lr * mh / (np.sqrt(vh) + eps)

        def forward(A):
            return (np.tanh(A @ W1 + b1) @ W2 + b2) * xsd + xmu

        # in-sample fitted = 1-step-ahead output of the window ending
        # just before each position (direct parity with the recursive
        # kernel's fitted semantics)
        Xin, _ = sliding_windows(y, L, 1)
        if len(Xin):
            fitted[L:] = forward((Xin - xmu) / xsd)[:, 0]
        fc = forward((y[None, n - L:] - xmu) / xsd)[0]
        if h > H:
            fc = np.concatenate([fc, np.full(h - H, fc[-1])])
        return fitted, fc[:h]

    return model_fn


def rnn_model(
    df: DataFrame, features=None, lags: int = 7, hidden: int = 16,
    epochs: int = 400, lr: float = 0.01, **kwargs,
) -> DataFrame:
    """Reference 'rnn'/'lstm' (TF Keras, models.py:561-816). TensorFlow
    is absent from this container, so the DIRECT multi-output MLP over
    the same sliding-window matrices (models.py:651-671) serves as the
    TF-free implementation of the direct multi-horizon strategy —
    per-series parallel through run_series_kernel."""
    try:  # pragma: no cover - env-dependent
        import tensorflow  # noqa: F401
        # TF backend wiring lands when TF is available in the image
    except ImportError:
        pass
    from scalecast_spark.models.kernel import run_series_kernel

    return run_series_kernel(df, make_direct_mlp(lags, hidden, epochs, lr))
