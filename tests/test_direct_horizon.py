"""Direct multi-output horizon model (VERDICT r1 'Next round' #4):
numpy MLP with H outputs over the reference's sliding-window matrices
(models.py:651-671), registered as the TF-free rnn/lstm estimator."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster
from scalecast_spark.models.mlp import make_direct_mlp, sliding_windows


def test_sliding_windows_parity():
    """Window matrix parity with the recursive kernel's AR features:
    row i of X is [y_{i} .. y_{i+L-1}]; row i of T is the next H."""
    y = np.arange(10, dtype=float)
    X, T = sliding_windows(y, lags=3, horizon=2)
    assert X.shape == (6, 3) and T.shape == (6, 2)
    np.testing.assert_array_equal(X[0], [0, 1, 2])
    np.testing.assert_array_equal(T[0], [3, 4])
    np.testing.assert_array_equal(X[-1], [5, 6, 7])
    np.testing.assert_array_equal(T[-1], [8, 9])
    # AR-feature correspondence: X row ending at t has ar_1 = y[t],
    # ar_2 = y[t-1], ... — the recursive kernel's design row for t+1
    assert X[2][-1] == y[4] and X[2][-2] == y[3]


def test_sliding_windows_degenerate():
    X, T = sliding_windows(np.arange(3, dtype=float), lags=5, horizon=2)
    assert X.shape == (0, 5) and T.shape == (0, 2)


def test_direct_mlp_learns_linear_trend():
    y = np.arange(60, dtype=float)
    fn = make_direct_mlp(lags=5, hidden=12, epochs=800, lr=0.02)
    fitted, fc = fn(y, 4)
    assert len(fc) == 4
    assert np.isnan(fitted[:5]).all() and not np.isnan(fitted[5:]).any()
    # a direct model on a clean trend should continue it approximately
    for i, v in enumerate(fc):
        assert v == pytest.approx(60.0 + i, abs=6.0)
    # each horizon step is produced directly, not recursively:
    # the forecast is monotone like the data
    assert all(b > a - 2.0 for a, b in zip(fc, fc[1:]))


def test_direct_mlp_short_series_flatlines():
    fitted, fc = make_direct_mlp(lags=7)(np.array([5.0, 6.0, 7.0]), 3)
    assert len(fc) == 3 and np.isfinite(fc).all()


def test_rnn_cell_learns_seasonal_trend():
    """The true SimpleRNN cell (BPTT) reaches the noise floor on a
    noisy weekly cycle + trend — a materially wrong gradient would
    plateau far above it."""
    from scalecast_spark.models.mlp import make_direct_rnn

    rng = np.random.RandomState(0)
    t = np.arange(150)
    y = 5 * np.sin(2 * np.pi * t / 7) + 0.05 * t + 0.3 * rng.randn(150)
    for cell in ("rnn", "lstm"):
        fn = make_direct_rnn(lags=7, hidden=16, epochs=300, cell=cell)
        fitted, fc = fn(y[:-7], 7)
        rmse = float(np.sqrt(np.mean((fc - y[-7:]) ** 2)))
        assert rmse < 0.9, f"{cell}: {rmse}"  # noise sd is 0.3
        assert np.isnan(fitted[:7]).all() and not np.isnan(fitted[7:]).any()


def test_rnn_cell_beats_flat_mlp_on_long_memory():
    """Weight sharing across timesteps: on a lag-21 seasonal walk seen
    through a 48-step window, the flat MLP must estimate 48×16
    first-layer weights from ~85 windows while the cell reuses one
    input weight vector — the recurrent inductive bias wins (fixed
    seeds; a demonstration of the advantage, not a universal law)."""
    from scalecast_spark.models.mlp import make_direct_rnn

    rng = np.random.RandomState(3)
    n = 140
    y = np.zeros(n)
    for t in range(21, n):
        y[t] = 0.95 * y[t - 21] + 0.5 * rng.randn()
    tr, te = y[:-7], y[-7:]
    _, fc_r = make_direct_rnn(lags=48, hidden=16, epochs=300)(tr, 7)
    _, fc_m = make_direct_mlp(lags=48, hidden=16, epochs=300)(tr, 7)
    rmse_r = float(np.sqrt(np.mean((fc_r - te) ** 2)))
    rmse_m = float(np.sqrt(np.mean((fc_m - te) ** 2)))
    assert rmse_r < rmse_m


def test_lstm_cell_distinct_from_rnn_and_mlp():
    from scalecast_spark.models.mlp import make_direct_rnn

    y = np.arange(80, dtype=float) + np.tile([0, 3, 1, 2], 20)
    _, fc_r = make_direct_rnn(lags=8, hidden=8, epochs=100)(y, 4)
    _, fc_l = make_direct_rnn(lags=8, hidden=8, epochs=100, cell="lstm")(y, 4)
    assert not np.allclose(fc_r, fc_l)  # genuinely different cells
    with pytest.raises(ValueError):
        make_direct_rnn(cell="gru")


def test_rnn_estimator_end_to_end(spark):
    rows = []
    d0 = dt.date(2024, 1, 1)
    for s in range(3):
        for i in range(50):
            rows.append(
                (f"s{s}", d0 + dt.timedelta(days=i), float(10 + s + i % 7), 0)
            )
    df = spark.createDataFrame(
        rows, schema="series_id string, ds date, y double, is_future int"
    )
    f = Forecaster(df, future_dates=5)
    f.set_test_length(5)
    f.set_estimator("rnn").manual_forecast(lags=7, hidden=8, epochs=150)
    h = f.history["rnn"]
    fc = h["forecast"]
    assert fc.count() == 15  # 3 series x 5 steps
    assert fc.filter(F.col("forecast").isNull()).count() == 0
    assert h["summary"]["TestSetRMSE"] > 0
    # lstm runs the 4-gate LSTM cell through the same direct strategy
    f.set_estimator("lstm").manual_forecast(lags=7, hidden=8, epochs=100)
    assert "lstm" in f.history
    assert f.history["lstm"]["forecast"].count() == 15


def test_gen_rnn_grid(spark):
    from scalecast_spark.grids import gen_rnn_grid

    g1 = gen_rnn_grid(random_seed=3, lags=(7, 14), epochs=50)
    g2 = gen_rnn_grid(random_seed=3, lags=(7, 14), epochs=50)
    assert g1 == g2  # seeded determinism
    assert set(g1) == {"hidden", "lr", "lags", "epochs"}
    assert g1["epochs"] == [50]  # scalar kwarg wrapped
    assert g1["lags"] == [7, 14]
    assert all(isinstance(h, int) and h >= 8 for h in g1["hidden"])

    # ingests and tunes through the rnn estimator
    rows = []
    d0 = dt.date(2024, 1, 1)
    for i in range(40):
        rows.append(("s0", d0 + dt.timedelta(days=i), float(10 + i % 7), 0))
    df = spark.createDataFrame(
        rows, schema="series_id string, ds date, y double, is_future int"
    )
    f = Forecaster(df, future_dates=3)
    f.set_test_length(5)
    f.set_validation_length(5)
    f.set_estimator("rnn")
    f.ingest_grid(gen_rnn_grid(layer_tries=2, random_seed=1, lags=7, epochs=40))
    f.limit_grid_size(2, random_seed=1)
    f.tune()
    assert f.best_params is not None and "hidden" in f.best_params


def test_direct_linear_exact_on_trend():
    """Ridge with small alpha on a pure linear trend: each horizon step
    is recovered near-exactly (the design spans the trend), and the
    forecast continues the line — unlike the network members, this is a
    closed-form solve, so tolerance is tight."""
    from scalecast_spark.models.mlp import make_direct_linear

    y = np.arange(60, dtype=float)
    fitted, fc = make_direct_linear(lags=5, alpha=1e-8)(y, 7)
    np.testing.assert_allclose(fc, 60.0 + np.arange(7), atol=1e-5)
    assert np.isnan(fitted[:5]).all()
    np.testing.assert_allclose(fitted[5:], y[5:], atol=1e-5)


def test_direct_linear_matches_independent_solve():
    """Member parity vs an independently-built normal-equations solve
    (lstsq on the augmented centered+standardized system) on noisy
    data — the ridge is defined in the standardized column space
    (round 8; the correlation-scale Gram is what keeps the SQL replay
    inside 6 dp)."""
    from scalecast_spark.models.mlp import make_direct_linear

    rng = np.random.RandomState(7)
    y = np.sin(np.arange(80) * 0.3) * 5 + rng.randn(80)
    L, H, alpha = 7, 7, 10.0
    X, T = sliding_windows(y, L, H)
    xmu, tmu = X.mean(0), T.mean(0)
    Xc, Tc = X - xmu, T - tmu
    sx = np.sqrt((Xc * Xc).sum(0) / len(Xc))
    sx[sx == 0.0] = 1.0
    B = np.linalg.lstsq(
        np.vstack([Xc / sx, np.sqrt(alpha) * np.eye(L)]),
        np.vstack([Tc, np.zeros((L, H))]),
        rcond=None,
    )[0]
    want = ((y[-L:] - xmu) / sx) @ B + tmu
    _, fc = make_direct_linear(lags=L, alpha=alpha)(y, H)
    np.testing.assert_allclose(fc, want, rtol=1e-9)


def test_direct_linear_short_and_constant():
    from scalecast_spark.models.mlp import make_direct_linear

    # shorter than one window: flat-line on last value
    _, fc = make_direct_linear(lags=7)(np.array([5.0, 6.0]), 3)
    np.testing.assert_array_equal(fc, [6.0, 6.0, 6.0])
    # constant series: ridge keeps the Gram SPD; forecast ~= constant
    _, fc = make_direct_linear(lags=7, alpha=10.0)(np.full(40, 3.0), 7)
    np.testing.assert_allclose(fc, 3.0, atol=1e-9)
    # h beyond trained horizon H extends with the last direct step
    y = np.arange(30, dtype=float)
    _, fc = make_direct_linear(lags=4, alpha=1e-8)(y, 3)
    assert len(fc) == 3
