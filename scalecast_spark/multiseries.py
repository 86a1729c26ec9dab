"""Import-compatibility with the reference's ``scalecast.multiseries``
(reference src/scalecast/multiseries.py): the dict-of-Forecasters
helpers ported scripts import by this module path. Both live on
forecaster.py — this module is the reference-named doorway."""

from scalecast_spark.forecaster import (  # noqa: F401
    export_model_summaries,
    keep_smallest_first_date,
)


def line_up_dates(*fs):
    """Trim every passed Forecaster to the SAME date range (reference
    multiseries.py:39-53): common first date, then chop the longer
    fronts to the shortest length. Counts come from one aggregate per
    object — never the series values."""
    keep_smallest_first_date(*fs)
    sizes = [f.tsf.observed.count() for f in fs]
    need = min(sizes)
    for f, n in zip(fs, sizes):
        if n > need:
            f.chop_from_front(n - need)
    return fs
