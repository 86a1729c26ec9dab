"""Finite-difference gradient check for the BPTT trainer — the one
remaining non-oracled iterative path (ts_forecast_direct). The
analytic gradients in models/mlp._bptt_grads differentiate
loss = Σ err² / (2·rows); central differences of that loss through the
EXACT production forward (_cell_forward) must agree coordinate-wise
for both the tanh RNN cell and the 4-gate LSTM."""

import numpy as np
import pytest

from scalecast_spark.models.mlp import _bptt_grads, _cell_forward


def _setup(cell: str, seed: int = 0):
    rng = np.random.RandomState(seed)
    L, hidden, H, rows = 4, 3, 2, 10
    G = 4 if cell == "lstm" else 1
    Wx = rng.randn(1, G * hidden) * 0.5
    Wh = rng.randn(hidden, G * hidden) * 0.4
    b = rng.randn(G * hidden) * 0.1
    if cell == "lstm":
        b[hidden: 2 * hidden] += 1.0
    W2 = rng.randn(hidden, H) * 0.5
    b2 = rng.randn(H) * 0.1
    params = [Wx, Wh, b, W2, b2]
    Xs = rng.randn(rows, L)
    Ts = rng.randn(rows, H)
    return params, Xs, Ts, L, hidden


def _loss(params, Xs, Ts, L, hidden, cell):
    out = _cell_forward(params, Xs, L, hidden, cell)
    return float(np.sum((out - Ts) ** 2)) / (2 * len(Xs))


@pytest.mark.parametrize("cell", ["rnn", "lstm"])
def test_bptt_matches_finite_differences(cell):
    params, Xs, Ts, L, hidden = _setup(cell)
    grads = _bptt_grads(params, Xs, Ts, L, hidden, cell)
    eps = 1e-6
    rng = np.random.RandomState(7)
    for pi, (p, g) in enumerate(zip(params, grads)):
        assert g.shape == p.shape, pi
        flat_p, flat_g = p.ravel(), g.ravel()
        # every coordinate for the small params, a sample for the big
        idxs = (
            range(flat_p.size)
            if flat_p.size <= 12
            else rng.choice(flat_p.size, 12, replace=False)
        )
        for j in idxs:
            orig = flat_p[j]
            flat_p[j] = orig + eps
            up = _loss(params, Xs, Ts, L, hidden, cell)
            flat_p[j] = orig - eps
            dn = _loss(params, Xs, Ts, L, hidden, cell)
            flat_p[j] = orig
            fd = (up - dn) / (2 * eps)
            assert fd == pytest.approx(flat_g[j], rel=1e-4, abs=1e-7), (
                cell,
                pi,
                j,
            )


@pytest.mark.parametrize("cell", ["rnn", "lstm"])
def test_gradient_step_decreases_loss(cell):
    params, Xs, Ts, L, hidden = _setup(cell, seed=1)
    base = _loss(params, Xs, Ts, L, hidden, cell)
    grads = _bptt_grads(params, Xs, Ts, L, hidden, cell)
    stepped = [p - 1e-3 * g for p, g in zip(params, grads)]
    assert _loss(stepped, Xs, Ts, L, hidden, cell) < base
