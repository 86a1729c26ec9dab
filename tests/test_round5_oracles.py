"""Randomized cross-engine robustness for the round-5 SQL oracles:
the prophet/tbats/auto_arima numpy cores vs their DuckDB Gauss-Jordan
replays on SYNTHETIC series the testdata never exercises (different
lengths, trends, seasonality strengths, positivity regimes). Pure
numpy + DuckDB — no Spark session — so these run in seconds and catch
oracle drift the sf-fixture gate would miss."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod
from scalecast_spark.models.arima import (
    arima_fit_forecast,
    auto_arima_orders,
    prophet_fit_forecast,
    tbats_fit_forecast,
)


def _con_with_events(series: dict[str, np.ndarray]):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_type VARCHAR, ts TIMESTAMP, value DOUBLE)"
    )
    for sid, y in series.items():
        con.executemany(
            "INSERT INTO events VALUES (?, TIMESTAMP '2024-01-01' "
            "+ to_days(CAST(? AS INT)) + INTERVAL '1 hour', ?)",
            [(sid, i, float(v)) for i, v in enumerate(y)],
        )
    return con


def _gen(seed: int, n: int, trend: float, seas: float, level: float):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    y = (
        level
        + trend * t
        + seas * np.sin(t * 2 * np.pi / 7)
        + rng.randn(n) * 2.0
    )
    return y


CASES = [
    {"n": 20, "trend": 0.0, "seas": 3.0, "level": 40.0, "seed": 1},
    {"n": 45, "trend": 1.5, "seas": 0.0, "level": 100.0, "seed": 2},
    {"n": 33, "trend": -0.8, "seas": 6.0, "level": 500.0, "seed": 3},
    # negative values: tbats must take the identity (no Box-Cox) path
    {"n": 28, "trend": 0.0, "seas": 5.0, "level": 0.0, "seed": 4},
]


def _oracle_map(con, sql):
    out = {}
    for model, sid, ds, fc in con.execute(sql).fetchall():
        out.setdefault((model, sid), []).append((str(ds), fc))
    return {k: [v for _, v in sorted(rows)] for k, rows in out.items()}


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"seed{c['seed']}")
def test_prophet_tbats_oracle_on_synthetic(case):
    series = {
        "s1": _gen(case["seed"], case["n"], case["trend"], case["seas"], case["level"]),
        "s2": _gen(case["seed"] + 100, case["n"], 0.3, 2.0, 80.0),
    }
    con = _con_with_events(series)
    got = _oracle_map(con, entrymod._prophet_tbats_oracle())
    for sid, y in series.items():
        _, fc_p = prophet_fit_forecast(y, 7)
        _, fc_b = tbats_fit_forecast(y, 7)
        assert np.allclose(
            np.round(fc_p, 6), got[("prophet", sid)], atol=0
        ), ("prophet", sid)
        assert np.allclose(
            np.round(fc_b, 3), got[("tbats", sid)], atol=0
        ), ("tbats", sid)


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"seed{c['seed']}")
def test_auto_arima_oracle_on_synthetic(case):
    series = {
        "s1": _gen(case["seed"], case["n"], case["trend"], case["seas"], case["level"]),
        # a near-random-walk series so the ADF d=1 branch is exercised
        "s2": 50.0
        + np.cumsum(np.random.RandomState(case["seed"] + 7).randn(case["n"])),
    }
    con = _con_with_events(series)
    rows = con.execute(entrymod._auto_arima_oracle()).fetchall()
    got = {}
    for sid, ds, fc in rows:
        got.setdefault(sid, []).append((str(ds), fc))
    got = {k: [v for _, v in sorted(rs)] for k, rs in got.items()}
    for sid, y in series.items():
        order = auto_arima_orders(y)
        _, fc = arima_fit_forecast(y, 7, order)
        assert np.allclose(np.round(fc, 6), got[sid], atol=0), (sid, order)


def test_pacf_durbin_levinson_oracle_on_synthetic():
    """The DL recursive CTE inside the ts_periodogram oracle vs the
    engine's pacf kernel, on a fresh synthetic series."""
    from scalecast_spark.plotting import pacf_frame  # noqa: F401 (engine twin)

    y = _gen(9, 40, 0.5, 4.0, 60.0)
    con = _con_with_events({"s": y})
    sql = entrymod.oracle_sql()["ts_periodogram"]
    rows = con.execute(sql).fetchall()
    got = sorted(
        (x, v) for mem, sid, x, v in rows if mem == "pacf"
    )
    # independent numpy Durbin-Levinson over the same ROUNDED acf
    dy = y - y.mean()
    c0 = float(dy @ dy)
    rho = [1.0] + [
        round(float(dy[k:] @ dy[:-k]) / c0, 6) for k in range(1, 13)
    ]
    pacf = [1.0, rho[1]]
    phi = np.array([rho[1]])
    for k in range(2, 13):
        num = rho[k] - float(phi @ rho[k - 1:0:-1])
        den = 1.0 - float(phi @ rho[1:k])
        kk = num / den if den != 0 else 0.0
        phi = np.append(phi - kk * phi[::-1], kk)
        pacf.append(kk)
    assert np.allclose([v for _, v in got], np.round(pacf, 6), atol=0)


VECM_CASES = [
    # cointegrated trio: two random walks + linear combos, rank >= 1
    {"seed": 11, "n": 30, "kind": "coint", "nseries": 3},
    # independent random walks: the trace test should go low-rank
    {"seed": 12, "n": 40, "kind": "rw", "nseries": 4},
    # near-stationary noise around level: high rank, exercises clamp n-1
    {"seed": 13, "n": 25, "kind": "stat", "nseries": 2},
    # 7 series: n-r > 6 has NO Osterwald-Lenum critical value — both
    # sides must skip those r (engine: crit None; oracle: crit join gap)
    {"seed": 14, "n": 35, "kind": "rw", "nseries": 7},
]


@pytest.mark.parametrize("case", VECM_CASES, ids=lambda c: c["kind"])
def test_vecm_oracle_on_synthetic(case):
    """The mv_vecm Johansen/Jacobi oracle vs the numpy engine core
    (models/vecm.py) on synthetic multivariate systems with different
    dimensions and cointegration ranks — the dims, the rank CASE logic,
    and both Jacobi recursions must all adapt."""
    from scalecast_spark.models.vecm import (
        _johansen, _trace_test_rank, vecm_fit_forecast,
    )

    rng = np.random.RandomState(case["seed"])
    n, m = case["n"], case["nseries"]
    if case["kind"] == "coint":
        w1 = 50 + np.cumsum(rng.randn(n) * 3)
        w2 = 80 + np.cumsum(rng.randn(n) * 2)
        cols = [w1, w2, 0.5 * w1 + 0.3 * w2 + rng.randn(n)]
    elif case["kind"] == "rw":
        cols = [
            100 * (j + 1) + np.cumsum(rng.randn(n) * (2 + j))
            for j in range(m)
        ]
    else:
        cols = [60 + 10 * j + rng.randn(n) * 4 for j in range(m)]
    # series ids sorted ascending, matching the oracle's row_number order
    series = {f"s{j}": c for j, c in enumerate(cols)}
    Ymat = np.column_stack([series[k] for k in sorted(series)])

    eigvals, _, rows_ = _johansen(Ymat, 1)
    nn = Ymat.shape[1]
    # the ENGINE's rank logic (not a copy), plus vecm_model's clamp
    rank = _trace_test_rank(eigvals, rows_, nn)["rank"]
    rank = max(min(rank, nn - 1), 0)
    _, fc = vecm_fit_forecast(Ymat, 7, 1, rank)

    con = _con_with_events(series)
    rows = con.execute(entrymod._vecm_oracle()).fetchall()
    got = {}
    for sid, ds, v in rows:
        got.setdefault(sid, []).append((str(ds), v))
    got = {k: [v for _, v in sorted(rs)] for k, rs in got.items()}
    for j, sid in enumerate(sorted(series)):
        assert np.allclose(
            np.round(fc[:, j], 4), got[sid], atol=0
        ), (sid, rank)


SMOOTH_CASES = [
    # strong weekly seasonality + trend: HWES grid should pick
    # different cells than the fixture corpus does
    {"seed": 21, "n": 35, "trend": 1.2, "seas": 8.0, "level": 120.0},
    # trendless, noisy: SES/theta-dominant regime
    {"seed": 22, "n": 28, "trend": 0.0, "seas": 0.5, "level": 60.0},
    # short series right at the 2m HWES fallback boundary (n = 2m = 14
    # -> HWES still runs; exercises the shortest valid seasonal path)
    {"seed": 23, "n": 14, "trend": -0.5, "seas": 4.0, "level": 200.0},
]


@pytest.mark.parametrize("case", SMOOTH_CASES, ids=lambda c: f"seed{c['seed']}")
def test_smoothing_family_oracle_on_synthetic(case):
    """The SES/Holt/HWES/Theta recursion-and-grid oracle vs the numpy
    engine cores on synthetic series — different data moves the SSE
    argmin to grid cells and recursion states the sf fixtures never
    select."""
    from scalecast_spark.models.smoothing import (
        holt, holt_winters, ses, theta,
    )

    series = {
        "s1": _gen(case["seed"], case["n"], case["trend"], case["seas"],
                   case["level"]),
        "s2": _gen(case["seed"] + 50, case["n"], 0.2, 2.0, 90.0),
    }
    con = _con_with_events(series)
    sql = entrymod.oracle_sql()["ts_smoothing_family"]
    got = {}
    for sid, ds, f_ses, f_holt, f_hw, f_th in con.execute(sql).fetchall():
        got.setdefault(sid, []).append((str(ds), f_ses, f_holt, f_hw, f_th))
    got = {k: [v[1:] for v in sorted(rs)] for k, rs in got.items()}
    for sid, y in series.items():
        _, fc_ses = ses(y, 7)
        _, fc_holt = holt(y, 7)
        _, fc_hw = holt_winters(y, 7, m=7)
        _, fc_th = theta(y, 7)
        want = list(zip(
            np.round(fc_ses, 6), np.round(fc_holt, 6),
            np.round(fc_hw, 6), np.round(fc_th, 6),
        ))
        assert len(got[sid]) == 7
        for g, w in zip(got[sid], want):
            assert g == pytest.approx(w, abs=0), (sid, g, w)


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"seed{c['seed']}")
def test_arima_family_oracle_on_synthetic(case):
    """The ts_arima two-member oracle (AR(1) Hannan-Rissanen closed
    form; ARIMA(0,1,0)(0,1,0,7) double-difference reintegration) vs the
    numpy engine core on fresh series — exercises phi/mu/reintegration
    states the fixtures never produce."""
    series = {
        "s1": _gen(case["seed"], case["n"], case["trend"], case["seas"],
                   case["level"]),
        "s2": _gen(case["seed"] + 200, case["n"], -0.4, 3.0, 150.0),
    }
    con = _con_with_events(series)
    got = _oracle_map(con, entrymod.oracle_sql()["ts_arima"])
    for sid, y in series.items():
        _, fc_ar1 = arima_fit_forecast(y, 7, order=(1, 0, 0))
        _, fc_sar = arima_fit_forecast(
            y, 7, order=(0, 1, 0), seasonal_order=(0, 1, 0, 7)
        )
        assert np.allclose(
            np.round(fc_ar1, 6), got[("ar1", sid)], atol=0
        ), ("ar1", sid)
        assert np.allclose(
            np.round(fc_sar, 6), got[("sarima", sid)], atol=0
        ), ("sarima", sid)
