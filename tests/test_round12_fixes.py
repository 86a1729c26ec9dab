"""Round-12 verdict/advice items: the importable MVPipeline name with
the reference's list-step + multi-frame fit_predict shape (reference
Pipeline.py:464-593, test/test_Pipeline.py:44-78), the MVForecaster
multi-Forecaster constructor (reference MVForecaster.py:34-174), deep
copy isolation for nested history containers, and eval_cis(False)
honored by transfer_predict."""

from functools import partial

import pytest
from pyspark.sql import functions as F

from scalecast_spark import Forecaster, MVForecaster, MVPipeline
from scalecast_spark.frame import DS, SERIES, Y
from scalecast_spark.models import MODELS
from scalecast_spark.operators import transforms as tr
from scalecast_spark.pipeline import Reverter, Transformer
from scalecast_spark.sources import events_to_series, load_table
from scalecast_spark.transform_search import find_statistical_transformation


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    return events_to_series(load_table(spark, sf_dir, "events")).withColumn(
        "is_future", F.lit(0)
    ).cache()


def _single(series, sid):
    return series.filter(F.col(SERIES) == sid)


def test_mvpipeline_reference_flow(series):
    """Transliteration of reference test_Pipeline.py::test_mvpipeline:
    per-series statistical transformers in a list step, one combined
    forecast step, per-series reverters, multi-frame fit_predict
    returning a tuple."""
    ids = [r[0] for r in series.select(SERIES).distinct().orderBy(SERIES).collect()][:3]
    fs = [_single(series, sid) for sid in ids]
    trs = [
        Transformer(find_statistical_transformation(f, m=7, adf_maxlag=1))
        for f in fs
    ]
    revs = [Reverter(t) for t in trs]

    def mv_forecaster(df):
        return MODELS["naive"](df, m=7)

    pipeline = MVPipeline(
        steps=[
            ("Transform", trs),
            ("Forecast", mv_forecaster),
            ("Revert", revs),
        ],
        names=ids,
    )
    outs = pipeline.fit_predict(*fs)
    assert isinstance(outs, tuple) and len(outs) == 3
    for sid, f0, out in zip(ids, fs, outs):
        got = out.select(SERIES).distinct().collect()
        assert [r[0] for r in got] == [sid]
        assert "forecast" in out.columns
        # revert round-trips y on observed rows
        err = (
            f0.select(SERIES, DS, F.col(Y).alias("y0"))
            .join(out.select(SERIES, DS, F.col(Y).alias("y1")), [SERIES, DS])
            .agg(F.max(F.abs(F.col("y0") - F.col("y1")))).collect()[0][0]
        )
        assert err < 1e-8


def test_mvpipeline_single_frame_and_copy(series):
    t = Transformer([tr.LogTransform()])
    p = MVPipeline(steps=[("T", t), ("M", partial(MODELS["naive"], m=7)),
                          ("R", Reverter(t))])
    out = p.fit_predict(series)
    assert "forecast" in out.columns
    # copy: list steps rebind reverters to the COPY's transformers
    t1, t2 = Transformer([tr.LogTransform()]), Transformer([tr.LogTransform()])
    p2 = MVPipeline(steps=[("T", [t1, t2]), ("R", [Reverter(t1), Reverter(t2)])])
    c = p2.copy()
    (_, cts), (_, crs) = c.steps
    assert cts[0] is not t1 and crs[0].base is cts[0]
    assert cts[1] is not t2 and crs[1].base is cts[1]


def test_mvpipeline_list_length_mismatch(series):
    p = MVPipeline(steps=[("T", [Transformer([tr.LogTransform()])])])
    with pytest.raises(ValueError, match="1 elements"):
        p.fit_predict(series)  # 5 series, 1 transformer


def test_mvforecaster_reference_constructor(series):
    ids = [r[0] for r in series.select(SERIES).distinct().orderBy(SERIES).collect()][:2]
    fa = Forecaster(_single(series, ids[0]))
    fa.add_time_trend()
    fb = Forecaster(_single(series, ids[1]))
    mvf = MVForecaster(fa, fb, names=["first", "second"], test_length=5)
    got = sorted(r[0] for r in mvf.tsf.df.select(SERIES).distinct().collect())
    assert got == ["first", "second"]
    assert mvf.test_length == 5
    # merge_Xvars='union': fa's trend column exists, NULL on fb's rows
    assert "t" in mvf.tsf.features or any(
        c.startswith("t") for c in mvf.tsf.features
    )
    # native single-frame form still works through the same name
    mvf2 = MVForecaster(series)
    assert isinstance(mvf2, Forecaster)
    with pytest.raises(TypeError, match="MVForecaster"):
        MVForecaster(fa, 42)
    with pytest.raises(TypeError, match="unexpected kwargs"):
        MVForecaster(fa, fb, bogus_knob=1)


def test_copy_isolates_nested_history(series):
    f = Forecaster(series.filter(F.col(SERIES) == "click"), future_dates=5)
    f.set_test_length(5).set_estimator("naive")
    f.manual_forecast(m=7, call_me="n1")
    g = f.copy()
    # mutate a NESTED dict on the copy — must not leak into the original
    g.history["n1"]["summary"]["injected"] = "copy-only"
    assert "injected" not in f.history["n1"]["summary"]
    g.history["n1"]["extra_list"] = [1]
    assert "extra_list" not in f.history["n1"]


def test_transfer_predict_honors_cis_off(series):
    src_df = series.filter(F.col(SERIES) == "click")
    f_src = Forecaster(src_df, future_dates=5)
    f_src.set_test_length(5)
    f_src.add_ar_terms(2)
    f_src.set_estimator("mlr").manual_forecast(call_me="mlr")
    f_dst = Forecaster(src_df, future_dates=5)
    f_dst.set_test_length(5)
    f_dst.add_ar_terms(2)
    f_dst.cis = False  # eval_cis(mode=False) opt-out
    f_dst.transfer_predict(f_src, "mlr", call_me="xfer")
    cols = f_dst.history["xfer"]["forecast"].columns
    assert "upper" not in cols and "lower" not in cols
    # and with cis left at the default, intervals DO appear
    f_on = Forecaster(src_df, future_dates=5)
    f_on.set_test_length(5)
    f_on.add_ar_terms(2)
    f_on.transfer_predict(f_src, "mlr", call_me="xfer")
    cols_on = f_on.history["xfer"]["forecast"].columns
    assert "upper" in cols_on and "lower" in cols_on


def test_scratch_cache_bounded_across_calls(spark):
    """r11 verdict: hamming_near_pairs' internal band-projection cache
    had no unpersist hook — repeated calls in a long-lived session
    accumulated pinned entries. The scratch registry bounds it at one
    live entry per operator tag."""
    import pandas as pd

    from scalecast_spark.datapipe.dedup import (
        _SCRATCH_CACHES,
        hamming_near_pairs,
        release_scratch_caches,
    )

    pdf = pd.DataFrame({
        "doc_id": list(range(40)),
        "simhash": [i * 37 % (1 << 48) for i in range(40)],
    })
    df = spark.createDataFrame(pdf)

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    release_scratch_caches()
    base = n_persistent()
    counts = []
    for _ in range(3):
        counts.append(
            hamming_near_pairs(df, "simhash", bits=48, max_hamming=3).count()
        )
    assert len(set(counts)) == 1  # same answer every call
    assert n_persistent() <= base + 1  # at most ONE live internal cache
    assert len(_SCRATCH_CACHES) <= 1
    release_scratch_caches()
    assert n_persistent() == base
    # cache=False leaves nothing behind at all
    hamming_near_pairs(df, "simhash", bits=48, max_hamming=3, cache=False).count()
    assert n_persistent() == base


def test_pipeline_backtest_method(series):
    """Reference Pipeline_parent.backtest (Pipeline.py:260-357) as a
    METHOD on the pipeline: whole-composition rolling-origin backtest;
    held-out actuals joined back at original scale, y masked during
    the run so transforms/models cannot peek."""
    from scalecast_spark.pipeline import backtest_metrics

    t = Transformer([tr.LogTransform()])
    p = MVPipeline(steps=[("T", t), ("M", partial(MODELS["naive"], m=7)),
                          ("R", Reverter(t))])
    res = p.backtest(series, fcst_length=5, n_iter=2, jump_back=3)
    pdf = res.toPandas()
    n_series = series.select(SERIES).distinct().count()
    assert len(pdf) == 2 * n_series * 5  # iter x series x horizon
    assert pdf["y"].notna().all()  # actuals re-joined at original scale
    assert pdf["forecast"].notna().all()
    spans = pdf.groupby("iteration")["ds"].max().tolist()
    assert len(set(spans)) == 2  # iterations rewound to different cutoffs
    mets = backtest_metrics(res, metrics=["rmse", "mae"]).toPandas()
    assert len(mets) == 3  # 2 iterations + the -1 average row
    assert (mets["rmse"] > 0).all() and (mets["mae"] > 0).all()


def test_break_mv_forecaster_round_trip(series):
    from scalecast_spark import MVForecaster, break_mv_forecaster

    mvf = MVForecaster(series)
    mvf.set_test_length(7)
    fs = break_mv_forecaster(mvf)
    ids = sorted(r[0] for r in series.select(SERIES).distinct().collect())
    assert len(fs) == len(ids)
    for f, sid in zip(fs, ids):
        got = [r[0] for r in f.tsf.df.select(SERIES).distinct().collect()]
        assert got == [sid]
        assert f.test_length == 7
        assert f.tsf.features == ()  # drop_all_Xvars default
    # frames are shared filters, not copies: total rows partition
    assert sum(f.tsf.df.count() for f in fs) == series.count()
    # re-combining the broken pieces round-trips
    mvf2 = MVForecaster(*fs)
    assert mvf2.tsf.df.count() == series.count()


def test_keep_smaller_history_date_form_and_common_start(spark):
    """keep_smaller_history accepts a DATE cutoff (reference
    Forecaster.py:1725 signature: int | str | datetime) and
    keep_smallest_first_date (multiseries.py:25-37) trims every
    object to the latest common first date."""
    import pandas as pd

    from scalecast_spark import Forecaster, keep_smallest_first_date

    base = pd.Timestamp("2024-01-01")
    def mk(start, n):
        pdf = pd.DataFrame({
            "series_id": ["s"] * n,
            "ds": [base + pd.Timedelta(days=start + i) for i in range(n)],
            "y": [float(i) for i in range(n)],
        })
        return Forecaster(spark.createDataFrame(pdf))

    fa, fb = mk(0, 20), mk(5, 15)
    # date-form trim
    fc = mk(0, 20)
    fc.keep_smaller_history("2024-01-10")
    assert fc.tsf.observed.agg(F.min("ds")).collect()[0][0] == base + pd.Timedelta(days=9)
    fc.restore_series_length()
    assert fc.tsf.observed.count() == 20
    # common-start alignment: fb starts day 5, so fa trims to day 5
    keep_smallest_first_date(fa, fb)
    a0 = fa.tsf.observed.agg(F.min("ds")).collect()[0][0]
    b0 = fb.tsf.observed.agg(F.min("ds")).collect()[0][0]
    assert a0 == b0 == base + pd.Timedelta(days=5)
    assert fa.tsf.observed.count() == 15


def test_export_model_summaries_across_objects(series):
    """reference multiseries.export_model_summaries: one frame across
    a dict of Forecaster objects, keyed by a Series label."""
    from scalecast_spark import export_model_summaries

    def fit(sid):
        f = Forecaster(series.filter(F.col(SERIES) == sid), future_dates=5)
        f.set_test_length(5).set_estimator("naive")
        f.manual_forecast(m=7, call_me="n1")
        return f

    fd = {"first": fit("click"), "second": fit("purchase")}
    out = export_model_summaries(fd).toPandas()
    assert sorted(out["Series"]) == ["first", "second"]
    assert (out["ModelNickname"] == "n1").all()
    assert any(c.startswith("TestSet") for c in out.columns)
    with pytest.raises(ValueError):
        export_model_summaries({})


def test_export_dfs_keyword_alias(series):
    """reference call sites use f.export(dfs='model_summaries')."""
    f = Forecaster(series.filter(F.col(SERIES) == "click"), future_dates=5)
    f.set_test_length(5).set_estimator("naive")
    f.manual_forecast(m=7, call_me="n1")
    a = f.export("model_summaries").toPandas()
    b = f.export(dfs="model_summaries").toPandas()
    assert list(a.columns) == list(b.columns) and len(a) == len(b) == 1


def test_all_info_to_excel_exports(series, tmp_path):
    """reference Forecaster.py:2237-2288: one tab per model for banked
    feature importance and validation grids (CSV-directory fallback in
    this container — no xlsx engine installed)."""
    import os

    f = Forecaster(series.filter(F.col(SERIES) == "click"), future_dates=5)
    f.set_test_length(5).set_validation_length(5)
    f.add_ar_terms(2)
    f.set_estimator("mlr")
    f.ingest_grid({"normalizer": [None, "minmax"]})
    f.tune()
    f.auto_forecast(call_me="m1")
    f.save_feature_importance("m1")
    p1 = f.all_feature_info_to_excel(str(tmp_path))
    assert os.path.exists(os.path.join(p1, "m1.csv")) or p1.endswith(".xlsx")
    p2 = f.all_validation_grids_to_excel(str(tmp_path))
    assert os.path.exists(os.path.join(p2, "m1.csv")) or p2.endswith(".xlsx")
    bare = Forecaster(series.filter(F.col(SERIES) == "click"))
    with pytest.raises(ValueError, match="feature importance"):
        bare.all_feature_info_to_excel(str(tmp_path))
    with pytest.raises(ValueError, match="grids"):
        bare.all_validation_grids_to_excel(str(tmp_path))
