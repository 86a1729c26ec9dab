"""Single-hidden-layer MLP regressor in numpy (reference 'mlp' via
sklearn MLPRegressor, cfg.py:26-48), plus the DIRECT multi-horizon
network standing in for the TF-backed 'rnn'/'lstm' estimators
(models.py:561-878): same sliding-window input/target matrices
(models.py:651-671), H outputs predicted in one forward pass.

Full-batch Adam on MSE with tanh hidden units — deterministic seeding,
fits a few-hundred-row series in milliseconds inside the shared kernel.
"""

from __future__ import annotations

import warnings

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


def _clip_global(grads: list, max_norm: float = 1.0) -> list:
    """Global-norm gradient clipping — BPTT through tanh chains can
    spike early in training; clipping keeps Adam's steps sane."""
    total = float(np.sqrt(sum(float((g * g).sum()) for g in grads)))
    if total > max_norm:
        scale = max_norm / (total + 1e-12)
        grads = [g * scale for g in grads]
    return grads


def _cell_forward(params, A, L, hidden, cell, trace=False):
    """Shared-weight recurrent forward pass (rnn: tanh cell; lstm:
    4-gate). Module-level so the finite-difference gradient test can
    drive the EXACT code the trainer runs."""
    Wx, Wh, b, W2, b2 = params
    sig = lambda a: 1.0 / (1.0 + np.exp(-a))  # noqa: E731
    r = len(A)
    hs = np.zeros((L + 1, r, hidden))
    cs = np.zeros((L + 1, r, hidden))
    gates = []
    for t in range(L):
        pre = A[:, t: t + 1] @ Wx + hs[t] @ Wh + b
        if cell == "rnn":
            hs[t + 1] = np.tanh(pre)
            gates.append(None)
        else:
            i = sig(pre[:, :hidden])
            f = sig(pre[:, hidden: 2 * hidden])
            g = np.tanh(pre[:, 2 * hidden: 3 * hidden])
            o = sig(pre[:, 3 * hidden:])
            cs[t + 1] = f * cs[t] + i * g
            hs[t + 1] = o * np.tanh(cs[t + 1])
            gates.append((i, f, g, o))
    out = hs[L] @ W2 + b2
    return (out, hs, cs, gates) if trace else out


def _bptt_grads(params, Xs, Ts, L, hidden, cell):
    """Full-unroll BPTT gradients of loss = Σ err² / (2·rows) — the
    loss the analytic expressions below differentiate (gW2 =
    hs.T @ err / rows etc.). Returns UNCLIPPED [gWx, gWh, gb, gW2,
    gb2]; verified against central finite differences in
    tests/test_bptt_gradcheck.py."""
    Wx, Wh, b, W2, b2 = params
    rows = len(Xs)
    out, hs, cs, gates = _cell_forward(params, Xs, L, hidden, cell, trace=True)
    err = out - Ts  # (rows, H)
    gW2 = hs[L].T @ err / rows
    gb2 = err.mean(axis=0)
    gWx = np.zeros_like(Wx)
    gWh = np.zeros_like(Wh)
    gb = np.zeros_like(b)
    dh = err @ W2.T
    dc = np.zeros((rows, hidden))
    for t in reversed(range(L)):
        if cell == "rnn":
            dpre = dh * (1 - hs[t + 1] ** 2)
        else:
            i, f, g, o = gates[t]
            tc = np.tanh(cs[t + 1])
            do = dh * tc
            dc = dc + dh * o * (1 - tc**2)
            di, df_, dg = dc * g, dc * cs[t], dc * i
            dpre = np.concatenate(
                [
                    di * i * (1 - i),
                    df_ * f * (1 - f),
                    dg * (1 - g**2),
                    do * o * (1 - o),
                ],
                axis=1,
            )
            dc = dc * f
        gWx += Xs[:, t: t + 1].T @ dpre / rows
        gWh += hs[t].T @ dpre / rows
        gb += dpre.mean(axis=0)
        dh = dpre @ Wh.T
    return [gWx, gWh, gb, gW2, gb2]


def _train_cell(
    Xs: np.ndarray,
    Ts: np.ndarray,
    L: int,
    hidden: int,
    epochs: int,
    lr: float,
    seed: int,
    cell: str,
    record_loss: bool = False,
) -> tuple[list, list[float]]:
    """The make_direct_rnn training loop, extracted verbatim so the
    loss-history kernel (:func:`rnn_loss_frame`) trains EXACTLY the
    network the estimator ships — init, clip, Adam step order all
    bit-identical. Returns (trained params, per-epoch losses — empty
    unless ``record_loss``; losses are loss(params) BEFORE each
    epoch's update, the Σerr²/(2·rows) objective the finite-difference
    gradient check pins)."""
    rng = np.random.RandomState(seed)
    rows = len(Xs)
    G = 4 if cell == "lstm" else 1  # gate multiplier
    Wx = rng.randn(1, G * hidden) * 0.5
    Wh = rng.randn(hidden, G * hidden) * np.sqrt(1.0 / hidden)
    b = np.zeros(G * hidden)
    if cell == "lstm":
        b[hidden: 2 * hidden] = 1.0  # forget-gate bias
    W2 = rng.randn(hidden, Ts.shape[1]) * np.sqrt(1.0 / hidden)
    b2 = np.zeros(Ts.shape[1])
    params = [Wx, Wh, b, W2, b2]
    mom = [np.zeros_like(q) for q in params]
    vel = [np.zeros_like(q) for q in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    losses: list[float] = []

    for step in range(1, epochs + 1):
        if record_loss:
            err = _cell_forward(params, Xs, L, hidden, cell) - Ts
            losses.append(float(np.sum(err * err) / (2.0 * rows)))
        grads = _clip_global(_bptt_grads(params, Xs, Ts, L, hidden, cell))
        for idx, g_ in enumerate(grads):
            mom[idx] = beta1 * mom[idx] + (1 - beta1) * g_
            vel[idx] = beta2 * vel[idx] + (1 - beta2) * g_ * g_
            mh = mom[idx] / (1 - beta1**step)
            vh = vel[idx] / (1 - beta2**step)
            params[idx] -= lr * mh / (np.sqrt(vh) + eps)
    return params, losses


def rnn_loss_frame(
    df: DataFrame,
    lags: int = 7,
    hidden: int = 16,
    epochs: int = 300,
    lr: float = 0.02,
    cell: str = "rnn",
    seed: int = 42,
) -> DataFrame:
    """Per-epoch training-loss curves for the rnn/lstm estimator, one
    curve per series — the distributed data source behind
    plotting.plot_rnn_loss (the reference plots a single TF History,
    util.py:23-56; here every series trains its own cell inside the
    kernel, so the loss history is a FRAME: (series_id, epoch, loss)).

    Runs the estimator's exact training (_train_cell — same init,
    clipping, Adam order) with loss recording on; cost is one extra
    forward pass per epoch, only when this diagnostic is requested.
    """
    import pandas as pd
    from pyspark.sql import types as T2

    from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y

    if cell not in ("rnn", "lstm"):
        raise ValueError(f"cell must be 'rnn' or 'lstm', got {cell!r}")
    schema = T2.StructType(
        [
            T2.StructField(SERIES, df.schema[SERIES].dataType),
            T2.StructField("epoch", T2.IntegerType()),
            T2.StructField("loss", T2.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(DS)
        obs = pdf[pdf[IS_FUTURE] == 0] if IS_FUTURE in pdf.columns else pdf
        y = obs[Y].to_numpy(float)
        sid = pdf[SERIES].iloc[0]
        n = len(y)
        H = 1 if IS_FUTURE not in pdf.columns else max(
            int((pdf[IS_FUTURE] == 1).sum()), 1
        )
        L = max(1, min(lags, n - H - 1))
        X, T = sliding_windows(y, L, H)
        if len(X) < 2:
            return pd.DataFrame({SERIES: [], "epoch": [], "loss": []})
        xmu, xsd = y.mean(), y.std() or 1.0
        _, losses = _train_cell(
            (X - xmu) / xsd, (T - xmu) / xsd, L, hidden, epochs, lr,
            seed, cell, record_loss=True,
        )
        return pd.DataFrame(
            {
                SERIES: sid,
                "epoch": np.arange(1, len(losses) + 1, dtype=np.int32),
                "loss": losses,
            }
        )

    return df.groupBy(SERIES).applyInPandas(run, schema)


def make_direct_rnn(
    lags: int = 7, hidden: int = 16, epochs: int = 300, lr: float = 0.02,
    seed: int = 42, cell: str = "rnn",
):
    """TRUE recurrent cell (reference models.py:561-878, TF
    SimpleRNN/LSTM stacks) trained with full-unroll BPTT in numpy —
    the recurrent-computation counterpart to make_direct_mlp's
    flat-window network. The sequence of the last ``lags`` scalars is
    consumed one timestep at a time through a shared-weight cell; the
    final hidden state maps to ``horizon`` direct outputs (the
    reference's direct multi-horizon strategy, models.py:651-671).

    cell='rnn':  h_t = tanh(x_t·Wx + h_{t-1}·Wh + b)
    cell='lstm': standard 4-gate LSTM (i,f,g,o; forget-bias 1.0).

    Weight sharing across timesteps is the point: an L-lag flat MLP
    estimates L·hidden first-layer weights from (n-L-H) windows, the
    cell estimates hidden (+hidden²) regardless of L — at long lags on
    short series the recurrent inductive bias wins (tested)."""
    if cell not in ("rnn", "lstm"):
        raise ValueError(f"cell must be 'rnn' or 'lstm', got {cell!r}")

    def model_fn(y: np.ndarray, h: int):
        y = np.asarray(y, dtype=float)
        n = len(y)
        fitted = np.full(n, np.nan)
        H = max(h, 1)
        L = max(1, min(lags, n - H - 1))
        X, T = sliding_windows(y, L, H)
        if len(X) < 2:  # degenerate series: flat-line
            return fitted, np.full(h, y[-1] if n else np.nan)
        xmu, xsd = y.mean(), y.std() or 1.0
        Xs, Ts = (X - xmu) / xsd, (T - xmu) / xsd
        params, _ = _train_cell(
            Xs, Ts, L, hidden, epochs, lr, seed, cell
        )

        def predict(A):
            return _cell_forward(params, A, L, hidden, cell) * xsd + xmu

        # in-sample fitted: the 1-step direct output of the window
        # ending just before each position (same semantics as the MLP)
        Xin, _ = sliding_windows(y, L, 1)
        if len(Xin):
            fitted[L:] = predict((Xin - xmu) / xsd)[:, 0]
        fc = predict((y[None, n - L:] - xmu) / xsd)[0]
        if h > H:
            fc = np.concatenate([fc, np.full(h - H, fc[-1])])
        return fitted, fc[:h]

    return model_fn


def rnn_model(
    df: DataFrame, features=None, lags: int = 7, hidden: int = 16,
    epochs: int = 300, lr: float = 0.02, cell: str | None = None,
    **kwargs,
) -> DataFrame:
    """Reference 'rnn' (TF SimpleRNN stacks, models.py:561-816). The
    numpy implementation IS the estimator — a real SimpleRNN cell
    trained with full-unroll BPTT (make_direct_rnn) under the
    reference's direct multi-horizon strategy, per-series parallel
    through run_series_kernel, gradient-checked against central
    finite differences (tests/test_bptt_gradcheck.py). A Keras-backed
    variant is NOT silently substituted when TF happens to be
    installed (unlike xgboost/catboost, where the real package
    computes the same objective, a TF training loop would change the
    numbers); a user wanting TF plugs their own estimator in via
    ``models.add_estimator``. ``cell='mlp'`` selects the flat-window
    direct MLP (the pre-round-4 behavior) for comparison."""
    from scalecast_spark.models.kernel import run_series_kernel

    # reference-keyword remaps (README LSTM shape, models.py:561-878):
    # learning_rate is Keras' name for lr; *_layer_sizes stacks
    # collapse to the equivalent single-layer width (sum — the same
    # mapping gen_rnn_grid documents). batch_size/validation_split/
    # optimizer/dropout/activation are TF training-loop knobs the
    # full-batch numpy core has no analogue for; they pass through
    # **kwargs harmlessly.
    if "learning_rate" in kwargs:
        lr = float(kwargs.pop("learning_rate"))
    for sizes_kw in ("lstm_layer_sizes", "rnn_layer_sizes", "layers_struct"):
        sizes = kwargs.pop(sizes_kw, None)
        if sizes:
            # layers_struct is the reference's list of
            # ('LSTM'|'SimpleRNN'|'Dense', {'units': N, ...}) tuples
            # (models.py:561-878); *_layer_sizes are flat int lists.
            # Extract the width from either shape; warn (instead of
            # silently keeping hidden=16) when a spec can't be mapped.
            total, bad = 0, False
            for s in sizes:
                if (
                    isinstance(s, (tuple, list)) and len(s) == 2
                    and isinstance(s[1], dict)
                ):
                    total += int(s[1].get("units", 0))
                else:
                    try:
                        total += int(s)
                    except (TypeError, ValueError):
                        bad = True
            if bad or total <= 0:
                warnings.warn(
                    f"could not map {sizes_kw}={sizes!r} onto the numpy "
                    f"core's single-layer width; keeping hidden={hidden}",
                    stacklevel=2,
                )
            else:
                hidden = total
    if cell == "mlp":
        return run_series_kernel(df, make_direct_mlp(lags, hidden, epochs, lr))
    return run_series_kernel(
        df, make_direct_rnn(lags, hidden, epochs, lr, cell=cell or "rnn")
    )


def lstm_model(
    df: DataFrame, features=None, lags: int = 7, hidden: int = 16,
    epochs: int = 300, lr: float = 0.02, **kwargs,
) -> DataFrame:
    """Reference 'lstm' (TF LSTM stacks, models.py:818-878): the numpy
    4-gate LSTM cell with BPTT, direct multi-horizon outputs."""
    kwargs.pop("cell", None)  # pinned; a grid passing cell= must not TypeError
    return rnn_model(
        df, features, lags=lags, hidden=hidden, epochs=epochs, lr=lr,
        cell="lstm", **kwargs,
    )


def make_direct_linear(lags: int = 7, alpha: float = 10.0):
    """DIRECT per-step linear (ridge) forecaster — the linear
    degenerate of the reference's direct multi-horizon strategy
    (reference models.py:651-671 sliding-window input/target
    matrices): the SAME sliding-window design X (rows, L) the network
    members train on, but with the H-column target matrix fit by ONE
    centered+STANDARDIZED normal-equations solve with H right-hand
    sides (X'X is shared across the horizon steps; only X'T_h
    differs), intercept unpenalized via centering. Closed form =>
    SQL-restatable: the q_ts_forecast_direct oracle replays the
    multi-RHS solve with the keyed Gauss-Jordan CTE (_gj_dyn).
    ``alpha > 0`` keeps the Gram SPD on any input (constant series
    included; zero-variance columns get scale 1), so neither side
    needs a degenerate-fallback branch.

    Columns are standardized (divided by their population RMS after
    centering) before the Gram — the standard ridge convention (the
    penalty is scale-equivariant), and load-bearing for the
    correctness gate: on raw level-scale series the centered Gram has
    ~1e8-scale entries, and with small alpha the Gauss-Jordan replay
    vs np.linalg.solve diverged up to 3e-6 absolute in the forecasts
    (round-6/7 red row, 18/70 values straddling 6 dp). The
    correlation-scale Gram keeps engine-vs-oracle divergence ~1e-10
    absolute (measured, tools/synth_sf.py sweep) — >2e3 margin under
    the 6 dp rounding per COVERAGE.md's convention."""

    def model_fn(y: np.ndarray, h: int):
        y = np.asarray(y, dtype=float)
        n = len(y)
        fitted = np.full(n, np.nan)
        H = max(h, 1)
        L = max(1, min(lags, n - H - 1))
        X, T = sliding_windows(y, L, H)
        if not len(X):  # shorter than one window: flat-line
            return fitted, np.full(h, y[-1] if n else np.nan)
        xmu = X.mean(axis=0)
        tmu = T.mean(axis=0)
        Xc = X - xmu
        # population RMS of each centered column (explicit formula so
        # the SQL replay states the identical arithmetic; np.std would
        # re-center internally)
        sx = np.sqrt((Xc * Xc).sum(axis=0) / len(Xc))
        sx[sx == 0.0] = 1.0
        Xs = Xc / sx
        G = Xs.T @ Xs + alpha * np.eye(L)
        B = np.linalg.solve(G, Xs.T @ (T - tmu))  # (L, H) multi-RHS
        Xin, _ = sliding_windows(y, L, 1)
        if len(Xin):  # 1-step direct output = fitted (parity with MLP)
            fitted[L:] = ((Xin - xmu) / sx) @ B[:, 0] + tmu[0]
        fc = ((y[n - L:] - xmu) / sx) @ B + tmu
        if h > H:
            fc = np.concatenate([fc, np.full(h - H, fc[-1])])
        return fitted, fc[:h]

    return model_fn


def direct_linear_model(
    df: DataFrame, features=None, lags: int = 7, alpha: float = 10.0,
    **kwargs,
) -> DataFrame:
    """Direct multi-horizon ridge under the sliding-window strategy —
    hash-matched member of the ts_forecast_direct family."""
    from scalecast_spark.models.kernel import run_series_kernel

    return run_series_kernel(df, make_direct_linear(lags, alpha))


def fixed_net_params(rows: int, cols: int, offset: float) -> np.ndarray:
    """Deterministic closed-form weight grid ``sin(offset + i*cols +
    j) * 0.5`` — NOT an initializer for training (RandomState stays
    the trainers' init). Exists so a single forward pass of the
    production cell code is exactly restatable in SQL: the oracle
    embeds these values as double literals, so there is no
    cross-engine ``sin`` bit-matching dependency."""
    i, j = np.indices((rows, cols), dtype=float)
    return np.sin(offset + i * cols + j) * 0.5


def make_fixed_cell_forward(lags: int = 4, hidden: int = 2,
                            cell: str = "rnn"):
    """Fixed-weight SINGLE FORWARD PASS of the network cells — no
    training. Drives the PRODUCTION recurrence (:func:`_cell_forward`,
    the exact code the BPTT trainers run) and the MLP forward over the
    last ``lags`` standardized observations, with closed-form weights
    (:func:`fixed_net_params`). This is the deterministic,
    hash-matched driver-gate member for the network family (round-8
    verdict #2): 150-epoch Adam training is not SQL-restatable, but
    the inference math is, and this member pins it end-to-end
    (standardize -> recurrence/gates -> output layer -> de-standardize)
    against a DuckDB replay. Series shorter than ``lags+1`` flat-line
    (same degenerate convention as the trained members)."""
    if cell not in ("rnn", "lstm", "mlp"):
        raise ValueError(f"cell must be rnn/lstm/mlp, got {cell!r}")

    def model_fn(y: np.ndarray, h: int):
        y = np.asarray(y, dtype=float)
        n = len(y)
        fitted = np.full(n, np.nan)
        H = max(h, 1)
        if n <= lags:
            return fitted, np.full(h, y[-1] if n else np.nan)
        xmu, xsd = y.mean(), y.std() or 1.0
        A = (y[None, n - lags:] - xmu) / xsd
        if cell == "mlp":
            W1 = fixed_net_params(lags, hidden, 1.0)
            b1 = fixed_net_params(1, hidden, 2.0)[0]
            W2 = fixed_net_params(hidden, H, 3.0)
            b2 = fixed_net_params(1, H, 4.0)[0]
            out = np.tanh(A @ W1 + b1) @ W2 + b2
        else:
            G = 4 if cell == "lstm" else 1
            Wx = fixed_net_params(1, G * hidden, 1.0)
            Wh = fixed_net_params(hidden, G * hidden, 2.0)
            b = fixed_net_params(1, G * hidden, 3.0)[0]
            W2 = fixed_net_params(hidden, H, 4.0)
            b2 = fixed_net_params(1, H, 5.0)[0]
            out = _cell_forward([Wx, Wh, b, W2, b2], A, lags, hidden, cell)
        fc = out[0] * xsd + xmu
        if h > H:
            fc = np.concatenate([fc, np.full(h - H, fc[-1])])
        return fitted, fc[:h]

    return model_fn
