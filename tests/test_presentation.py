"""Round-6 presentation tier: reduction-error trajectory recording +
plot, per-series RNN loss curves, and the gated notebook browsers
(reference util.plot_reduction_errors / plot_rnn_loss and
notebook.results_vis — matplotlib/ipywidgets are absent in this
container, so the DATA paths are verified and the render paths
exercise their warn-and-return gating)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster, plotting as P
from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y


def _series_df(spark, n=45, sids=("a", "b"), seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for sid in sids:
        y = rng.normal(size=n).cumsum() + 50
        for i, v in enumerate(y):
            rows.append(
                (sid, pd.Timestamp("2024-01-01") + pd.Timedelta(days=i),
                 float(v))
            )
    return spark.createDataFrame(pd.DataFrame(rows, columns=[SERIES, DS, Y]))


@pytest.fixture(scope="module")
def small_f(spark):
    f = Forecaster(_series_df(spark), future_dates=5)
    f.set_test_length(5).set_validation_length(5)
    f.add_ar_terms(3).add_time_trend()
    return f


def test_reduce_xvars_records_trajectory(small_f):
    from scalecast_spark.selection import reduce_Xvars

    f = small_f
    before = set(f.tsf.features)
    kept = reduce_Xvars(f, estimator="mlr", keep_at_least=1)
    assert isinstance(f.pfi_dropped_vars, list)
    assert len(f.pfi_error_values) == len(f.pfi_dropped_vars) + 1
    assert set(kept) | set(f.pfi_dropped_vars) == before
    # accepted drops never increase the validation error
    assert all(
        b <= a + 1e-12
        for a, b in zip(f.pfi_error_values, f.pfi_error_values[1:])
    )
    # headless: returns the trajectory pairs with a warning
    with pytest.warns(UserWarning, match="matplotlib"):
        pairs = P.plot_reduction_errors(f)
    assert pairs == list(enumerate(f.pfi_error_values))


def test_plot_reduction_errors_requires_reduction(spark):
    g = Forecaster(_series_df(spark, n=20, sids=("z",)), future_dates=3)
    with pytest.raises(ValueError, match="reduce_Xvars"):
        P.plot_reduction_errors(g)


def test_rnn_loss_frame_decreases_and_training_unchanged(spark):
    """The loss kernel trains the estimator's exact network: recording
    is a read-only forward pass, so the estimator still forecasts, and
    the curve itself must be finite and decreasing overall."""
    from scalecast_spark.models import MODELS
    from scalecast_spark.models.mlp import rnn_loss_frame

    base = _series_df(spark).withColumn(IS_FUTURE, F.lit(0))
    lf = rnn_loss_frame(base, lags=5, hidden=4, epochs=40, lr=0.05).toPandas()
    assert set(lf[SERIES]) == {"a", "b"}
    for sid, grp in lf.groupby(SERIES):
        grp = grp.sort_values("epoch")
        assert len(grp) == 40
        assert np.isfinite(grp["loss"]).all()
        assert grp["loss"].iloc[-1] < grp["loss"].iloc[0], sid
    out = (
        MODELS["rnn"](base, lags=5, hidden=4, epochs=40, lr=0.05)
        .filter(F.col("forecast").isNotNull())
    )
    assert out.count() > 0
    # headless render gating
    loss_sdf = rnn_loss_frame(base, lags=5, hidden=4, epochs=5, lr=0.05)
    with pytest.warns(UserWarning, match="matplotlib"):
        assert P.plot_rnn_loss(loss_sdf) is None


def test_results_vis_headless(spark):
    from scalecast_spark import notebook as NB

    f = Forecaster(_series_df(spark, n=30, sids=("a",)), future_dates=3)
    f.set_test_length(3)
    f.set_estimator("naive")
    f.manual_forecast(call_me="naive")
    with pytest.raises(ValueError, match="plot_type"):
        NB.results_vis({"x": f}, plot_type="bogus")
    with pytest.raises(ValueError, match="empty"):
        NB.results_vis({})
    with pytest.warns(UserWarning):
        frame = NB.results_vis({"x": f}, plot_type="forecast")
    assert frame is not None and frame.count() >= 0
    with pytest.warns(UserWarning):
        NB.results_vis_mv({"x": f}, plot_type="test")
