"""Property-based tests for the round-9 components: invariants that
hold for ANY input, not just the fixtures — the MV kernel's design
layout, the fixed-weight network forward pass's affine equivariance,
and cross-corpus dedup's set-theoretic guarantees."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from scalecast_spark.models import KERNEL_FACTORIES
from scalecast_spark.models.mlp import make_fixed_cell_forward
from scalecast_spark.models.mv_kernel import mv_fit_forecast


def _mats(draw_rows, n):
    return st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
            min_size=n, max_size=n,
        ),
        min_size=draw_rows, max_size=draw_rows,
    )


@settings(max_examples=25, deadline=None)
@given(rows=_mats(15, 2), perm=st.permutations([0, 1]))
def test_mv_forecast_permutation_equivariant(rows, perm):
    """Permuting the series columns permutes the forecast columns
    identically — the wide-lag design layout treats series
    symmetrically (column c = (l-1)*n + s in series order)."""
    Y = np.asarray(rows, float)
    # ridge is permutation-equivariant only when the penalty treats
    # all slopes alike — it does (alpha * I)
    fit = KERNEL_FACTORIES["ridge"](alpha=1.0)
    _, fc = mv_fit_forecast(Y, 3, 2, fit)
    _, fcp = mv_fit_forecast(Y[:, list(perm)], 3, 2, fit)
    assert np.allclose(fcp, fc[:, list(perm)], atol=1e-6, rtol=1e-6)


@settings(max_examples=25, deadline=None)
@given(rows=_mats(15, 2))
def test_mv_zero_exog_column_is_inert(rows):
    """Appending an all-zero exog column must not move the ridge
    forecast: a constant-zero regressor earns a zero coefficient
    under the L2 penalty (intercept is separate)."""
    Y = np.asarray(rows, float)
    fit = KERNEL_FACTORIES["ridge"](alpha=1.0)
    _, a = mv_fit_forecast(Y, 3, 2, fit)
    _, b = mv_fit_forecast(
        Y, 3, 2, fit,
        exog=np.zeros((len(Y), 1)), exog_future=np.zeros((3, 1)),
    )
    assert np.allclose(a, b, atol=1e-6, rtol=1e-6)


@settings(max_examples=40, deadline=None)
@given(
    y=st.lists(
        st.floats(min_value=-1e3, max_value=1e3,
                  allow_nan=False, allow_infinity=False),
        min_size=8, max_size=40,
    ),
    a=st.floats(min_value=0.1, max_value=50),
    b=st.floats(min_value=-1e3, max_value=1e3),
    cell=st.sampled_from(["rnn", "lstm", "mlp"]),
)
def test_fixed_forward_affine_equivariant(y, a, b, cell):
    """fc(a*y + b) == a*fc(y) + b for a > 0: standardization makes
    the network input invariant to positive affine maps of the
    series, and the output de-standardizes with the same (mu, sd) —
    so the fixed-weight forward pass commutes with the units of the
    data. (The gate's hash depends on this NOT silently breaking.)
    Zero-variance series are excluded: sd=0 falls back to 1.0 (flat
    series standardize to zeros whatever the units), so the invariant
    legitimately does not apply there."""
    from hypothesis import assume

    y = np.asarray(y, float)
    assume(float(np.std(y)) > 1e-3)
    fn = make_fixed_cell_forward(4, 2, cell)
    _, fc = fn(y, 5)
    _, fc2 = fn(a * y + b, 5)
    ref = a * fc + b
    scale = max(1.0, np.abs(ref).max())
    assert np.allclose(fc2, ref, atol=1e-9 * scale)


def test_cross_dedup_set_guarantees(spark):
    """survivors ⊆ new; empty existing keeps everything; duplicating
    the existing corpus (same content, new ids) changes nothing —
    matching is content-only."""
    from scalecast_spark.datapipe.dedup import cross_dedup
    from pyspark.sql import functions as F

    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs before noon today"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "completely unrelated text about spark dataframes and shuffles"),
    ]
    new = spark.createDataFrame(base, "doc_id long, text string")
    old = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    surv = {r["doc_id"] for r in cross_dedup(new, old).collect()}
    assert surv <= {1, 2, 3, 4}
    assert 1 not in surv and 3 not in surv  # exact content match drops
    assert {2, 4} <= surv
    # empty existing: nothing to match, everything survives
    empty = old.filter(F.lit(False))
    assert {
        r["doc_id"] for r in cross_dedup(new, empty).collect()
    } == {1, 2, 3, 4}
    # duplicated existing content (fresh ids): same survivor set
    old2 = old.unionByName(
        old.withColumn("doc_id", F.col("doc_id") + 1000)
    )
    assert {
        r["doc_id"] for r in cross_dedup(new, old2).collect()
    } == surv
