"""Fixed-weight network forward passes (models/mlp.py
make_fixed_cell_forward) — the deterministic, SQL-restatable gate
members of the network family (round-8 verdict #2). The rnn/lstm legs
drive the PRODUCTION _cell_forward recurrence (the exact code the BPTT
trainers call); the DuckDB replay (_networks_forward_ctes) must agree
far inside the 6 dp gate rounding on the fixture AND off-fixture."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from scalecast_spark.models.mlp import (
    _cell_forward,
    fixed_net_params,
    make_fixed_cell_forward,
)

#: COVERAGE.md margin rule: unrounded engine-vs-oracle divergence must
#: clear the 0.5e-6 rounding boundary by >4e3; measured 1.4e-12 on the
#: sf0.01 fixture (3.7e5 margin)
MARGIN = 0.5e-6 / 4e3


def _oracle_fc(ser: pd.DataFrame) -> pd.DataFrame:
    import __spark_entry__ as e

    con = duckdb.connect()
    con.register("series_src", ser)
    sql = f"""
        WITH series AS (SELECT * FROM series_src),
        steps AS (SELECT unnest(range(1, 8)) AS step),
        {e._networks_forward_ctes()}
        SELECT 'rnn' AS cell, series_id, ds, forecast FROM nf_rnn_fc
        UNION ALL
        SELECT 'lstm', series_id, ds, forecast FROM nf_lstm_fc
        UNION ALL
        SELECT 'mlp', series_id, ds, forecast FROM nf_mlp_fc
    """
    return con.execute(sql).df()


def _compare(ser: pd.DataFrame) -> float:
    odf = _oracle_fc(ser)
    worst = 0.0
    for cell in ("rnn", "lstm", "mlp"):
        model_fn = make_fixed_cell_forward(4, 2, cell)
        for sid, g in ser.groupby("series_id"):
            y = g.sort_values("ds")["y"].to_numpy(float)
            _, fc = model_fn(y, 7)
            o = (
                odf[(odf.cell == cell) & (odf.series_id == sid)]
                .sort_values("ds")["forecast"]
                .to_numpy(float)
            )
            assert len(o) == 7
            worst = max(worst, float(np.abs(fc - o).max()))
    return worst


def test_forward_pass_matches_oracle_fixture(spark, sf_dir):
    """Engine forward pass vs DuckDB replay on the driver fixture."""
    import __spark_entry__ as e

    ser = e._series(spark, sf_dir).toPandas()
    ser["ds"] = pd.to_datetime(ser["ds"]).dt.date
    assert _compare(ser) < MARGIN


def test_forward_pass_matches_oracle_off_fixture():
    """Off-fixture sweep: random-walk series at level scales 1e0..1e5
    (the COVERAGE rule — a fixture-only margin is not a margin)."""
    rng = np.random.RandomState(7)
    rows = []
    for k, scale in enumerate([1.0, 1e2, 1e5]):
        for s in range(3):
            y = np.cumsum(rng.randn(40)) * scale + scale
            for i, v in enumerate(y):
                rows.append(
                    {
                        "series_id": f"s{k}_{s}",
                        "ds": (
                            pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
                        ).date(),
                        "y": float(v),
                    }
                )
    # absolute divergence grows with level scale; 1e5-scale series get
    # the same RELATIVE room (0.5 ulp at 6 dp of a 1e5 value ~ 5e-2)
    assert _compare(pd.DataFrame(rows)) < 1e-7


def test_production_cell_is_the_code_under_test():
    """The rnn/lstm legs must call _cell_forward — guard against the
    member drifting onto a private reimplementation."""
    y = np.cumsum(np.random.RandomState(0).randn(30)) + 50.0
    xmu, xsd = y.mean(), y.std()
    A = (y[None, -4:] - xmu) / xsd
    for cell in ("rnn", "lstm"):
        G = 4 if cell == "lstm" else 1
        params = [
            fixed_net_params(1, G * 2, 1.0),
            fixed_net_params(2, G * 2, 2.0),
            fixed_net_params(1, G * 2, 3.0)[0],
            fixed_net_params(2, 7, 4.0),
            fixed_net_params(1, 7, 5.0)[0],
        ]
        want = _cell_forward(params, A, 4, 2, cell)[0] * xsd + xmu
        _, fc = make_fixed_cell_forward(4, 2, cell)(y, 7)
        assert np.allclose(fc, want, atol=0, rtol=0)


def test_short_series_flatline():
    """n <= lags degenerates to a flat-line, the trained members'
    convention."""
    _, fc = make_fixed_cell_forward(4, 2, "rnn")(np.array([3.0, 4.0]), 5)
    assert (fc == 4.0).all()


def test_bad_cell_raises():
    with pytest.raises(ValueError, match="cell must be"):
        make_fixed_cell_forward(cell="gru")
