"""Pipeline / backtest (reference src/scalecast/Pipeline.py:11-593 and
util.py:112-230; SURVEY.md §2.11).

  * Transformer / Reverter — named wrappers over the transform stack
    (Pipeline.py:11-214): ordered fit_transform, reversed invert bound
    to the SAME fitted state.
  * Pipeline.fit_predict — composed steps: transformers, model steps
    (callables taking a Forecaster), reverters (Pipeline.py:361-462).
  * backtest — n_iter rewound runs (hold_out_len = fcst_length +
    i*jump_back, Pipeline.py:244-257). Every iteration is a FILTER over
    the one cached feature frame; iterations stack into a single long
    results frame keyed by ``iteration`` so downstream metrics are one
    groupBy — no per-iteration object copies, no driver loops over
    results.
  * backtest_metrics — (model × iteration × metric) table incl. the
    M4 scaled metrics mase/msis that need train-set context
    (util.py:112-230).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F, Window as W

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, TimeSeriesFrame, Y
from scalecast_spark.functions import metrics as METRICS
from scalecast_spark.operators.transforms import Transform


def _resolve_transform_spec(spec) -> Transform:
    """Reference tuple/string specs (Pipeline.py:30-60:
    ``('DiffTransform', 52)``, ``('DetrendTransform',)``,
    ``'LogTransform'``) resolve against the Transform classes in
    operators.transforms by name; Transform instances pass through."""
    if isinstance(spec, Transform):
        return spec
    from scalecast_spark.operators import transforms as _tr

    if isinstance(spec, str):
        spec = (spec,)
    if (
        isinstance(spec, (list, tuple))
        and spec
        and isinstance(spec[0], str)
    ):
        name, *args = spec
        kwargs = args.pop() if args and isinstance(args[-1], dict) else {}
        cls = getattr(_tr, name, None)
        if cls is None or not (
            isinstance(cls, type) and issubclass(cls, Transform)
        ):
            raise ValueError(
                f"unknown transform spec {name!r}; expected one of the "
                "Transform classes in scalecast_spark.operators.transforms"
            )
        return cls(*args, **kwargs)
    raise TypeError(
        f"transformer spec {spec!r} is neither a Transform instance nor "
        "a ('ClassName', args...) tuple"
    )


class Transformer:
    """Ordered transform list with fit_transform (Pipeline.py:11-102).
    Accepts Transform instances or the reference's string-tuple specs:
    ``Transformer(transformers=[('DiffTransform', 1),
    ('DetrendTransform',)])``."""

    def __init__(self, transformers: list):
        self.transformers = [_resolve_transform_spec(s) for s in transformers]

    def copy(self) -> "Transformer":
        """Isolated copy (reference Pipeline.py:96-102): fresh
        Transform instances so a later fit() on the copy never
        clobbers the original's fitted state. Transform params are
        scalars/strings; frames are immutable and shared."""
        import copy as _copy

        return Transformer([_copy.copy(t) for t in self.transformers])

    def fit_transform(self, df: DataFrame, col: str = Y) -> DataFrame:
        for t in self.transformers:
            t.fit(df)
            df = t.transform(df, col)
        return df


class Reverter:
    """Reversed invert bound to the base Transformer's fitted state
    (Pipeline.py:104-214). Accepts the engine's ``Reverter(base)`` or
    the reference keyword shape ``Reverter(reverters=[('DetrendRevert',),
    ('DiffRevert', 52)], base_transformer=transformer)`` — the revert
    LIST is validated against (but the fitted state always comes from)
    the base transformer, exactly the reference's coupling."""

    def __init__(self, base: Transformer | None = None, *,
                 reverters: list | None = None,
                 base_transformer: Transformer | None = None):
        if base is not None and not isinstance(base, Transformer):
            # reference positional shape: Reverter(reverters,
            # base_transformer=t) — the first positional IS the revert
            # list there, never the fitted transformer
            if reverters is not None:
                raise TypeError(
                    "got a reverters list both positionally and as "
                    "reverters="
                )
            reverters = base
            base = None
        if base is None:
            base = base_transformer
        if base is None:
            raise ValueError(
                "Reverter needs the fitted Transformer: pass it "
                "positionally or as base_transformer="
            )
        self.base = base
        self.reverters = list(reverters) if reverters is not None else None
        if reverters is not None:
            # each named revert must have a matching transform in the
            # base stack (order-insensitive count)
            names = [
                (s[0] if isinstance(s, (list, tuple)) else str(s))
                .replace("Revert", "Transform")
                for s in reverters
            ]
            have = [type(t).__name__ for t in base.transformers]
            for n in set(names):
                if names.count(n) > have.count(n):
                    raise ValueError(
                        f"reverters asks for {names.count(n)} × {n} but the "
                        f"base transformer fitted {have.count(n)}"
                    )

    def _revert_stack(self) -> list[Transform]:
        """The fitted transforms this Reverter actually inverts, in
        execution order. With no reverters list: the whole base stack
        reversed (engine shape). With one: each named revert claims
        the LAST unclaimed matching transform — a PARTIAL list is a
        legal reference usage and must not silently revert more."""
        if self.reverters is None:
            return list(reversed(self.base.transformers))
        remaining = list(self.base.transformers)
        out = []
        for spec in self.reverters:
            name, *args = (
                spec if isinstance(spec, (list, tuple)) else (str(spec),)
            )
            want = name.replace("Revert", "Transform")
            for i in range(len(remaining) - 1, -1, -1):
                t = remaining[i]
                if type(t).__name__ != want:
                    continue
                if want == "DiffTransform" and args and t.m != int(args[0]):
                    continue
                out.append(remaining.pop(i))
                break
            else:
                raise ValueError(
                    f"no unclaimed {want} in the base transformer for "
                    f"revert spec {spec!r}"
                )
        return out

    def fit_transform(self, df: DataFrame, *cols: str) -> DataFrame:
        cols = cols or (Y, "forecast")
        for t in self._revert_stack():
            df = t.invert(df, *cols)
        return df


def _is_forecaster(x) -> bool:
    return hasattr(x, "tsf") and hasattr(x, "history")


def _wants_forecaster(fn) -> bool:
    """Reference pipeline model steps are written as ``def
    forecaster(f, **kw)`` / ``def mvforecaster(mvf, models)`` —
    first-parameter NAME is the discriminator the reference's own
    docs establish; engine steps take a DataFrame (conventionally
    ``df``)."""
    import inspect

    try:
        params = list(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        return False
    return bool(params) and params[0] in (
        "f", "forecaster", "mvf", "mvforecaster"
    )


def _call_with_supported(fn, obj, kwargs):
    """Forward only the kwargs the step accepts (the reference's
    MVPipeline does the same signature filtering, Pipeline.py:520)."""
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return fn(obj)
    if any(
        p.kind == inspect.Parameter.VAR_KEYWORD
        for p in sig.parameters.values()
    ):
        return fn(obj, **kwargs)
    ok = {k: v for k, v in kwargs.items() if k in sig.parameters}
    return fn(obj, **ok)


def _frame_of(x) -> DataFrame:
    """Reference pipelines take Forecaster objects; the engine's take
    the long frame. Accept both: anything carrying a ``tsf`` (a
    Forecaster) or a ``df`` (a TimeSeriesFrame) contributes its frame,
    so reference-shaped calls like ``pipeline.fit_predict(f1, f2, f3)``
    work unchanged."""
    tsf = getattr(x, "tsf", None)
    if tsf is not None:
        return tsf.df
    inner = getattr(x, "df", None)
    if inner is not None and isinstance(inner, DataFrame):
        return inner
    return x


def _assert_single_series_inputs(frames: list[DataFrame], where: str) -> None:
    """Retagging an input's series_id with one literal name silently
    collapses a multi-series input into one series with duplicate
    timestamps, corrupting every window-based fit downstream — the
    MVForecaster constructor guards exactly this (forecaster.py
    per-input countDistinct); the whole-object pipeline paths must
    too (round-14 ADVICE). One aggregate job over the union of the
    (already tiny, usually cached) input spines; counts only, never
    the ids themselves."""
    from functools import reduce as _reduce

    counts = (
        _reduce(
            lambda a, b: a.unionByName(b),
            [
                df.select(F.lit(i).alias("_i"), SERIES)
                for i, df in enumerate(frames)
            ],
        )
        .groupBy("_i")
        .agg(F.countDistinct(SERIES).alias("_n"))
        .filter(F.col("_n") > 1)
        .collect()
    )
    if counts:
        bad = ", ".join(f"#{r['_i'] + 1} ({r['_n']} series)" for r in counts)
        raise ValueError(
            f"{where}: input Forecaster(s) {bad} hold multiple series; "
            "retagging with one name per input would merge them into a "
            "single series with duplicate timestamps. Pass single-series "
            "Forecasters (see break_mv_forecaster) or use the frame-mode "
            "pipeline for multi-series work."
        )


def _rewind_mark(base: DataFrame, hold: int, fcst_length: int) -> DataFrame:
    """One backtest iteration's frame: the last ``hold`` observations
    per series become the horizon, trimmed to its first
    ``fcst_length`` rows (reference ``hold_out[:fcst_length]``,
    Pipeline.py:245-246), with y masked NULL on horizon rows so the
    pipeline sees exactly the shape a real forecast sees (no
    actual-leak into transform fits or model steps)."""
    w = W.partitionBy(SERIES).orderBy(F.desc(DS))
    return (
        base.withColumn("_rev", F.row_number().over(w))
        .withColumn(
            IS_FUTURE, F.when(F.col("_rev") <= hold, 1).otherwise(0)
        )
        .filter(
            ~((F.col(IS_FUTURE) == 1) & (F.col("_rev") <= hold - fcst_length))
        )
        .drop("_rev")
        .withColumn(
            Y,
            F.when(F.col(IS_FUTURE) == 1, F.lit(None).cast("double"))
            .otherwise(F.col(Y)),
        )
    )


class Pipeline:
    """Ordered composition: Transformer steps, model callables (taking
    and returning a DataFrame with 'forecast'), Reverter steps
    (reference Pipeline.fit_predict, Pipeline.py:361-462)."""

    def __init__(self, steps: list[tuple[str, object]]):
        self.steps = steps

    def backtest(
        self,
        *dfs: DataFrame,
        fcst_length: int | str | None = None,
        n_iter: int = 5,
        jump_back: int = 1,
        test_length: int = 0,
        cis: bool = False,
        **kwargs,
    ) -> DataFrame:
        """Out-of-sample backtest of the WHOLE pipeline (reference
        Pipeline_parent.backtest, Pipeline.py:260-357): iteration i
        rewinds ``fcst_length + i*jump_back`` observations per series,
        masks the next ``fcst_length`` as the horizon (y NULL — the
        pipeline sees a real forecast's shape, so transform fits and
        model steps cannot peek at held-out actuals), runs the full
        ``fit_predict`` composition on the rewound frame, and joins the
        held-out actuals back.

        Returns ONE long frame (model='pipeline', iteration, series_id,
        ds, y, forecast) over held-out rows — the shape
        :func:`backtest_metrics` consumes directly (the reference's
        list-of-dicts return is a pandas packaging detail; here every
        iteration is rows in one frame and downstream metrics are one
        groupBy). MVPipeline inherits this unchanged: multiple frames
        union before the rewind and its fit_predict keeps list-valued
        steps per-series on the unioned frame.

        Scale: each iteration is a filter + the pipeline's own plan
        over the SAME cached base — n_iter plans, no data copies."""
        if not dfs:
            raise ValueError("backtest needs at least one frame")
        if self._forecaster_mode(dfs):
            return self._backtest_forecaster(
                list(dfs), fcst_length, n_iter, jump_back,
                test_length, cis, **kwargs,
            )
        if fcst_length in (None, "auto"):
            raise ValueError(
                "fcst_length is required for frame-mode backtests "
                "('auto' only resolves from a Forecaster's horizon)"
            )
        dfs = tuple(_frame_of(d) for d in dfs)
        names = getattr(self, "names", None)
        if names and len(dfs) > 1:
            # MVPipeline call shape: same re-tagging as fit_predict so
            # list-valued steps map to the same series during backtests
            if len(names) != len(dfs):
                raise ValueError(
                    f"names has {len(names)} entries for {len(dfs)} frames"
                )
            dfs = tuple(
                d.withColumn(SERIES, F.lit(n)) for d, n in zip(dfs, names)
            )
        base = dfs[0] if len(dfs) == 1 else None
        if base is None:
            from functools import reduce

            base = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
            )
        if IS_FUTURE not in base.columns:
            base = base.withColumn(IS_FUTURE, F.lit(0))
        else:
            # Forecaster frames carry synthetic y-NULL horizon rows
            # (future_dates=N); the reference backtests on observed
            # history only (Pipeline.py:241 iterates over f.y), so
            # those rows must not count as "the most recent
            # observations" in the rewind.
            base = base.filter(F.col(IS_FUTURE) == 0)
        base = base.cache()
        try:
            out = None
            for i in range(n_iter):
                hold = fcst_length + i * jump_back
                rewound = _rewind_mark(base, hold, fcst_length)
                actuals = base.join(
                    rewound.filter(F.col(IS_FUTURE) == 1).select(SERIES, DS),
                    [SERIES, DS],
                ).select(SERIES, DS, Y)
                scored = self.fit_predict(rewound)
                res = (
                    scored.filter(F.col(IS_FUTURE) == 1)
                    .drop(Y)
                    .join(actuals, [SERIES, DS])
                    .select(
                        F.lit("pipeline").alias("model"),
                        F.lit(i).alias("iteration"),
                        SERIES, DS, Y, "forecast",
                    )
                )
                out = res if out is None else out.unionByName(res)
            # Materialize before releasing the cache: out's plan reads
            # base n_iter times and each fit_predict may have collected
            # fitted params already, but the result frame itself is lazy.
            out = out.localCheckpoint(eager=True)
            return out
        finally:
            base.unpersist()

    def copy(self) -> "Pipeline":
        """Isolated pipeline copy (reference Pipeline.py:166-176
        ``copy``/``__deepcopy__``): Transformer steps get fresh
        Transform instances (so fitting the copy never clobbers the
        original's fitted state) and Reverters re-bind to their
        step's NEW base transformer when it is part of the same
        pipeline — preserving the fitted-state coupling the reference
        deepcopy keeps via the memo dict. Model callables and
        immutable frames are shared."""
        import copy as _copy

        rebound: dict[int, Transformer] = {}
        steps: list[tuple[str, object]] = []
        for name, step in self.steps:
            if isinstance(step, Transformer):
                new = step.copy()
                rebound[id(step)] = new
                steps.append((name, new))
            elif isinstance(step, Reverter):
                base = rebound.get(id(step.base), step.base)
                steps.append(
                    (name, Reverter(base, reverters=step.reverters))
                )
            else:
                steps.append((name, step))
        g = _copy.copy(self)
        g.steps = steps
        return g

    def _forecaster_mode(self, inputs) -> bool:
        """Reference mode: Forecaster object(s) in AND at least one
        model step written as ``def forecaster(f, ...)``. Engine mode
        (frames through df-callables) is unchanged otherwise — a
        Forecaster input with df-shaped steps still returns a frame."""
        def _flat():
            for _, s in self.steps:
                if isinstance(s, (list, tuple)):
                    yield from s
                else:
                    yield s

        return all(_is_forecaster(x) for x in inputs) and any(
            not isinstance(s, (Transformer, Reverter))
            and callable(s)
            and _wants_forecaster(s)
            for s in _flat()
        )

    def fit_predict(self, df: DataFrame, **kwargs) -> DataFrame:
        if self._forecaster_mode([df]):
            return self._fit_predict_forecaster(df, **kwargs)
        df = _frame_of(df)
        for name, step in self.steps:
            if isinstance(step, Transformer):
                df = step.fit_transform(df)
            elif isinstance(step, Reverter):
                df = step.fit_transform(df, Y, "forecast")
            elif callable(step):
                df = _call_with_supported(step, df, kwargs) if kwargs else step(df)
            else:
                raise TypeError(f"step {name!r} is not a Transformer/Reverter/callable")
        return df

    def _fit_predict_forecaster(self, f, **kwargs):
        """The reference's whole-object composition
        (Pipeline.py:361-462; docs/examples/Introduction2.ipynb cells
        101-108): Transformer steps rewrite the series in place, model
        steps MUTATE the Forecaster (add Xvars, bank models), Reverter
        steps revert the series AND every banked model's history at
        the original level. Returns the same Forecaster."""
        from scalecast_spark.series_transformer import SeriesTransformer

        st = SeriesTransformer(f)
        for name, step in self.steps:
            if isinstance(step, Transformer):
                for t in step.transformers:
                    st._apply(t)
            elif isinstance(step, Reverter):
                for t in step._revert_stack():
                    st.revert_instance(t)
            elif callable(step):
                _call_with_supported(step, f, kwargs)
            else:
                raise TypeError(
                    f"step {name!r} is not a Transformer/Reverter/callable"
                )
        return f

    def _backtest_forecaster(
        self, fs, fcst_length, n_iter, jump_back, test_length, cis, **kwargs
    ) -> DataFrame:
        """Whole-object rolling-origin backtest (reference
        Pipeline_parent.backtest, Pipeline.py:260-357; Introduction2
        cells 123/137): each iteration rewinds every input Forecaster,
        re-runs the FULL composition on a fresh pipeline copy (fresh
        transformer fits — no state leaks across iterations), and
        collects every banked model's horizon forecasts against the
        held-out actuals. ``fcst_length='auto'`` (reference default)
        reads the first input's future horizon; ``test_length``/
        ``cis`` override the clones' settings (reference passes 0 /
        False so the whole rewound history trains); other kwargs
        (``models=...``) forward to the function steps.

        Returns the engine's standard long backtest frame
        (model, iteration, series_id, ds, y, forecast) — feed it to
        :func:`backtest_metrics` directly."""
        from functools import reduce

        from scalecast_spark.forecaster import Forecaster

        names = list(getattr(self, "names", None) or [])
        if len(fs) > 1 and not hasattr(self, "_fit_predict_forecaster_mv"):
            raise TypeError(
                "backtest over multiple Forecasters needs an MVPipeline "
                "(a plain Pipeline has no combine->break step)"
            )
        if len(fs) > 1 and not names:
            # mirror _fit_predict_forecaster_mv's default naming — the
            # actuals join below must share series ids with the
            # retagged forecasts
            names = [f"y{i + 1}" for i in range(len(fs))]
        if names and len(names) != len(fs):
            raise ValueError(
                f"names has {len(names)} entries for {len(fs)} Forecasters"
            )
        bases = []
        for j, f in enumerate(fs):
            # bare series only: the composition re-derives its own
            # features per iteration (the reference backtests on
            # re-built Forecasters too), and stale feature columns
            # would collide with the re-derivation (duplicate ar_*)
            b = f.tsf.df.filter(F.col(IS_FUTURE) == 0).select(
                SERIES, DS, Y, IS_FUTURE
            )
            if names:
                b = b.withColumn(SERIES, F.lit(names[j]))
            bases.append(b.cache())
        if names:
            _assert_single_series_inputs(
                [f.tsf.df for f in fs], "Pipeline.backtest"
            )
        if fcst_length in (None, "auto"):
            fcst_length = (
                fs[0].tsf.df.filter(F.col(IS_FUTURE) == 1)
                .groupBy(SERIES).count().agg(F.max("count")).collect()[0][0]
            )
            if not fcst_length:
                raise ValueError(
                    "fcst_length='auto' needs the first Forecaster to "
                    "carry future dates"
                )
        fcst_length = int(fcst_length)
        try:
            out = None
            for i in range(n_iter):
                hold = fcst_length + i * jump_back
                clones = []
                for b, f in zip(bases, fs):
                    g = Forecaster(
                        TimeSeriesFrame(
                            df=_rewind_mark(b, hold, fcst_length),
                            freq_seconds=f.tsf.freq_seconds,
                            features=(),
                        )
                    )
                    g.test_length = int(test_length or 0)
                    g.cis = bool(cis)
                    g.validation_length = f.validation_length
                    g.metrics = list(f.metrics)
                    clones.append(g)
                pipe = self.copy()
                if len(clones) > 1:
                    # the backtest's test_length/cis overrides beat the
                    # pipeline's own kwargs on the per-iteration combine
                    # (reference passes test_length=0 / cis=False so the
                    # whole rewound history trains)
                    pipe.kwargs = {
                        **getattr(pipe, "kwargs", {}),
                        "test_length": int(test_length or 0),
                        "cis": bool(cis),
                    }
                    rfs = list(
                        pipe._fit_predict_forecaster_mv(clones, **kwargs)
                    )
                else:
                    rfs = [
                        pipe._fit_predict_forecaster(clones[0], **kwargs)
                    ]
                for rf in rfs:
                    for m, h in rf.history.items():
                        fc = h["forecast"].select(
                            F.lit(m).alias("model"),
                            F.lit(i).alias("iteration"),
                            SERIES, DS, "forecast",
                        )
                        out = fc if out is None else out.unionByName(fc)
            if out is None:
                raise ValueError(
                    "backtest: no model step banked any forecasts — "
                    "does the pipeline have a model step that calls "
                    "a forecasting method?"
                )
            actuals = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), bases
            ).select(SERIES, DS, Y)
            res = out.join(actuals, [SERIES, DS]).select(
                "model", "iteration", SERIES, DS, Y, "forecast"
            )
            # bounded: n_iter x fcst_length x series x models rows;
            # materialize before the base caches release
            return res.localCheckpoint(eager=True)
        finally:
            for b in bases:
                b.unpersist()


class MVPipeline(Pipeline):
    """Multivariate pipeline (reference Pipeline.py:464-593).

    The reference's MVPipeline combines k Forecaster objects into one
    MVForecaster before the model step and breaks them back apart for
    per-series reverts. In the long format the combined object IS one
    DataFrame, so combine/break are a union and a ``series_id``
    filter; what remains of the reference surface is the LIST-valued
    step — ``('Transform', [t1, t2, t3])`` applies each element to its
    positional series — and the multi-frame ``fit_predict(f1, f2, f3)``
    call shape returning a tuple.

    ``names`` (reference kwarg of the same name) re-tags each input
    frame's ``series_id``; other reference kwargs (``merge_Xvars``,
    ``not_same_len_action``...) are union/no-op decisions the long
    format already makes and are accepted-and-recorded only.
    """

    def __init__(self, steps: list[tuple[str, object]], names=None, **kwargs):
        super().__init__(steps)
        self.names = [str(n) for n in names] if names is not None else None
        self.kwargs = kwargs

    def copy(self) -> "MVPipeline":
        """Per-element isolation for list-valued steps (same
        Transformer-fresh / Reverter-rebind contract as Pipeline.copy)."""
        rebound: dict[int, Transformer] = {}

        def _one(step):
            if isinstance(step, Transformer):
                new = step.copy()
                rebound[id(step)] = new
                return new
            if isinstance(step, Reverter):
                return Reverter(
                    rebound.get(id(step.base), step.base),
                    reverters=step.reverters,
                )
            return step

        steps = [
            (name, [_one(s) for s in step] if isinstance(step, (list, tuple))
             else _one(step))
            for name, step in self.steps
        ]
        g = MVPipeline.__new__(MVPipeline)
        g.steps = steps
        g.names = list(self.names) if self.names else None
        g.kwargs = dict(self.kwargs)
        return g

    @staticmethod
    def _apply(step, df: DataFrame) -> DataFrame:
        if isinstance(step, Transformer):
            return step.fit_transform(df)
        if isinstance(step, Reverter):
            return step.fit_transform(df, Y, "forecast")
        if callable(step):
            return step(df)
        raise TypeError(f"step element {step!r} is not a Transformer/Reverter/callable")

    def fit_predict(self, *dfs: DataFrame, **kwargs):
        """``fit_predict(df)`` -> one long frame; ``fit_predict(f1, f2,
        f3)`` -> union, run, and a tuple filtered back per input (the
        reference's combine -> forecast -> break round trip,
        Pipeline.py:539-593). With Forecaster inputs and reference-
        shaped steps (``def mvforecaster(mvf, models)``), runs the
        whole-object composition and returns a tuple of Forecasters."""
        from functools import reduce

        if not dfs:
            raise ValueError("MVPipeline.fit_predict needs at least one frame")
        if self._forecaster_mode(dfs):
            return self._fit_predict_forecaster_mv(list(dfs), **kwargs)
        dfs = tuple(_frame_of(d) for d in dfs)
        many = len(dfs) > 1
        if many and self.names:
            if len(self.names) != len(dfs):
                raise ValueError(
                    f"names has {len(self.names)} entries for {len(dfs)} frames"
                )
            dfs = tuple(
                d.withColumn(SERIES, F.lit(n)) for d, n in zip(dfs, self.names)
            )
        if many:
            groups = self.names or [
                r[0]
                for d in dfs
                for r in d.select(SERIES).distinct().orderBy(SERIES).collect()
            ]
            df = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
            )
        else:
            df = dfs[0]
            groups = self.names or [
                r[0]
                for r in df.select(SERIES).distinct().orderBy(SERIES).collect()
            ]
        for name, step in self.steps:
            if isinstance(step, (list, tuple)):
                if len(step) != len(groups):
                    raise ValueError(
                        f"step {name!r} has {len(step)} elements for "
                        f"{len(groups)} series {groups}"
                    )
                parts = [
                    self._apply(s, df.filter(F.col(SERIES) == sid))
                    for sid, s in zip(groups, step)
                ]
                df = reduce(
                    lambda a, b: a.unionByName(b, allowMissingColumns=True),
                    parts,
                )
            else:
                df = self._apply(step, df)
        if many:
            return tuple(df.filter(F.col(SERIES) == g) for g in groups)
        return df

    def _fit_predict_forecaster_mv(self, fs, **kwargs):
        """The reference's MVPipeline whole-object flow
        (Pipeline.py:464-593; Introduction2.ipynb cell 132): per-series
        list steps run on each input Forecaster, the scalar model step
        runs on their MVForecaster combination, then the object breaks
        back apart and later list steps (the reverters) run per series
        with full history rewrite. Returns a tuple of Forecasters in
        input order.

        Scale note (VERDICT r12 #4): list-valued steps are reference-
        shape convenience — the driver loops over #inputs — so this
        mode is for few-series workloads; the scalar-step frame path
        is the fully distributed one."""
        from dataclasses import replace as _replace

        from scalecast_spark.forecaster import (
            MVForecaster, break_mv_forecaster,
        )
        from scalecast_spark.series_transformer import SeriesTransformer

        names = [str(n) for n in (self.names or [f"y{i + 1}" for i in range(len(fs))])]
        if len(names) != len(fs):
            raise ValueError(
                f"names has {len(names)} entries for {len(fs)} Forecasters"
            )
        _assert_single_series_inputs(
            [f.tsf.df for f in fs], "MVPipeline.fit_predict"
        )
        # retag once up front so per-series transform params stay
        # joinable across the combine -> break round trip
        for f, n in zip(fs, names):
            f.tsf = _replace(
                f.tsf, df=f.tsf.df.withColumn(SERIES, F.lit(n))
            )
        sts = [SeriesTransformer(f) for f in fs]
        combined = None

        def _one(st, el):
            if isinstance(el, Transformer):
                for t in el.transformers:
                    st._apply(t)
            elif isinstance(el, Reverter):
                for t in el._revert_stack():
                    st.revert_instance(t)
            elif callable(el):
                _call_with_supported(el, st.f, kwargs)
            else:
                raise TypeError(f"step element {el!r} unsupported")

        for name, step in self.steps:
            if isinstance(step, (list, tuple)):
                if len(step) != len(fs):
                    raise ValueError(
                        f"step {name!r} has {len(step)} elements for "
                        f"{len(fs)} Forecasters"
                    )
                for st, el in zip(sts, step):
                    _one(st, el)
            elif isinstance(step, (Transformer, Reverter)):
                raise TypeError(
                    f"step {name!r}: scalar Transformer/Reverter steps are "
                    "ambiguous in MV Forecaster mode — pass one per series "
                    "as a list (reference shape)"
                )
            elif callable(step):
                combined = MVForecaster(*[st.f for st in sts], names=names)
                # a second model step must not lose models banked by an
                # earlier one: re-union each model's per-series frames
                # (break gave the per-series objects lazy filters of
                # the same parents — the union is plan reuse, not data)
                prior: dict = {}
                for st in sts:
                    for m, h in st.f.history.items():
                        if m not in prior:
                            prior[m] = dict(h)
                            continue
                        merged = prior[m]
                        for key in (
                            "forecast", "fitted", "test_preds",
                            "per_series_test_metrics",
                            "per_series_insample_metrics",
                        ):
                            a, b = merged.get(key), h.get(key)
                            if a is not None and b is not None:
                                merged[key] = a.unionByName(
                                    b, allowMissingColumns=True
                                )
                combined.history.update(prior)
                kw = self.kwargs
                if kw.get("test_length"):
                    combined.set_test_length(kw["test_length"])
                if kw.get("validation_length"):
                    combined.set_validation_length(kw["validation_length"])
                if "cis" in kw:
                    combined.eval_cis(bool(kw["cis"]))
                _call_with_supported(step, combined, kwargs)
                parts = break_mv_forecaster(combined)  # sorted by series
                by_sid = dict(zip(sorted(names), parts))
                for st, n in zip(sts, names):
                    st.f = by_sid[n]
            else:
                raise TypeError(f"step {name!r} unsupported")
        return tuple(st.f for st in sts)


def backtest(
    series_df: DataFrame,
    model_fns: dict[str, callable],
    fcst_length: int,
    n_iter: int = 3,
    jump_back: int = 1,
    feature_fn=None,
) -> DataFrame:
    """Rolling-origin backtest.

    ``model_fns``: name -> callable(df_with_features) adding 'forecast'
    (use functools.partial over the registry). ``feature_fn``: optional
    df -> (df, features) builder applied per iteration AFTER the rewind
    so lag features never leak across the cutoff.

    Returns long frame (model, iteration, series_id, ds, y, forecast)
    over held-out rows only.
    """
    if IS_FUTURE in series_df.columns:
        # Backtest over observed history only: synthetic y-NULL horizon
        # rows from Forecaster(df, future_dates=N) frames must not be
        # counted as the most recent observations by the rewind.
        series_df = series_df.filter(F.col(IS_FUTURE) == 0)
    base = series_df.cache()
    out = None
    for i in range(n_iter):
        hold = fcst_length + i * jump_back
        w = W.partitionBy(SERIES).orderBy(F.desc(DS))
        marked = (
            base.withColumn("_rev", F.row_number().over(w))
            .withColumn(
                IS_FUTURE,
                F.when(F.col("_rev") <= hold, 1).otherwise(0),
            )
            .filter(~((F.col(IS_FUTURE) == 1) & (F.col("_rev") <= hold - fcst_length)))
            .drop("_rev")
        )
        if feature_fn is not None:
            marked, _ = feature_fn(marked)
        for name, fn in model_fns.items():
            scored = fn(marked)
            res = scored.filter(F.col(IS_FUTURE) == 1).select(
                F.lit(name).alias("model"),
                F.lit(i).alias("iteration"),
                SERIES,
                DS,
                Y,
                "forecast",
            )
            out = res if out is None else out.unionByName(res)
    return out


def backtest_kernel_models(
    series_df: DataFrame,
    models: dict[str, tuple[str, dict]],
    feature_fn,
    fcst_length: int,
    n_iter: int = 3,
    jump_back: int = 1,
) -> DataFrame:
    """ONE-PASS rolling-origin backtest for kernel-backed estimators.

    Same result frame as :func:`backtest` (model, iteration, series_id,
    ds, y, forecast over held-out rows), different physical plan: the
    generic loop reruns features + a full kernel pass per iteration
    (n_iter scans); here features build ONCE on the full frame and
    ``run_kernel_backtest`` slices/refits every iteration inside each
    series task — one scan + one shuffle regardless of n_iter.
    Backward-looking features (lags, trend, rolling) are iteration-
    invariant on the kept rows, so the two plans score identically.

    ``models``: name -> (estimator registry name, hyperparams).
    """
    import inspect

    from scalecast_spark.models import KERNEL_FACTORIES, MODELS
    from scalecast_spark.models.kernel import run_kernel_backtest

    if IS_FUTURE in series_df.columns:
        # Same observed-history-only guard as backtest(): drop synthetic
        # horizon rows before features so the per-series slices inside
        # run_kernel_backtest see only real observations.
        series_df = series_df.filter(F.col(IS_FUTURE) == 0)
    df, features = feature_fn(series_df)
    if IS_FUTURE not in df.columns:
        df = df.withColumn(IS_FUTURE, F.lit(0))
    out = None
    for name, (est, params) in models.items():
        if est not in KERNEL_FACTORIES:
            raise ValueError(
                f"{est!r} is not kernel-backed; use backtest() for it"
            )
        p = dict(params)
        sig = inspect.signature(MODELS[est]).parameters
        default_norm = sig["normalizer"].default if "normalizer" in sig else None
        norm = p.pop("normalizer", default_norm)
        dyn = p.pop("dynamic_testing", True)
        fit_fn = KERNEL_FACTORIES[est](**p)
        res = run_kernel_backtest(
            df, features, fit_fn, fcst_length, n_iter, jump_back, dyn, norm
        ).select(
            F.lit(name).alias("model"), "iteration", SERIES, DS, Y, "forecast"
        )
        out = res if out is None else out.unionByName(res)
    return out


def backtest_metrics(
    results: DataFrame,
    train_df: DataFrame | None = None,
    m: int = 1,
    metrics: list[str] | None = None,
    mets: list[str] | None = None,
    names: list[str] | None = None,
    mase: bool = False,
    msis: bool = False,
    alpha: float = 0.05,
) -> DataFrame:
    """(model × iteration) metric table + per-model average row
    (reference util.py:112-230). ``mets=`` is the reference's keyword
    for the metric list (accepted as an alias); ``names=`` relabels the
    series in per-series outputs (accepted for call-shape parity — the
    long frame already carries series_id, so it is recorded only).

    ``mase`` needs the in-sample seasonal-naive MAE denominator from the
    TRAINING data (Metrics.py:177-206) — pass ``train_df`` to enable it.
    """
    metrics = list(metrics or mets or ["rmse", "smape", "mae", "r2", "bias"])
    # reference flag shape (util.py:112-230: mase=True/msis=True
    # append the scaled metrics; both need the training data)
    if mase and "mase" not in metrics:
        metrics.append("mase")
    want_msis = msis or "msis" in metrics
    metrics = [mt for mt in metrics if mt != "msis"]
    want_mase = "mase" in metrics
    core = [mt for mt in metrics if mt != "mase"]
    per_iter = results.groupBy("model", "iteration").agg(
        *METRICS.metric_exprs(Y, "forecast", core)
    )
    if want_mase and train_df is not None:
        denom = METRICS.mase_denominator(train_df, y=Y, series=SERIES, ds=DS, m=m)
        scaled = (
            results.join(denom, SERIES)
            .groupBy("model", "iteration")
            .agg(
                F.avg(
                    F.try_divide(
                        F.abs(F.col("forecast") - F.col(Y)), F.col("mase_denom")
                    )
                ).alias("mase")
            )
        )
        per_iter = per_iter.join(scaled, ["model", "iteration"])
    if (
        want_msis
        and train_df is not None
        and all(c in results.columns for c in ("upper", "lower"))
    ):
        per_iter = per_iter.join(
            _msis_scores(results, train_df, m=m, alpha=alpha),
            ["model", "iteration"], "left",
        )
    avg = (
        per_iter.groupBy("model")
        .agg(*[F.avg(c).alias(c) for c in per_iter.columns if c not in ("model", "iteration")])
        .withColumn("iteration", F.lit(-1))
    )
    return per_iter.unionByName(avg.select(per_iter.columns))


def msis(
    results: DataFrame,
    train_df: DataFrame,
    m: int = 1,
    alpha: float = 0.05,
) -> DataFrame:
    """M4 mean scaled interval score (reference Metrics.py:208-246):
    requires upper/lower columns on ``results``; scaled by the same
    seasonal-naive denominator."""
    return _msis_scores(results, train_df, m=m, alpha=alpha)


def _msis_scores(
    results: DataFrame,
    train_df: DataFrame,
    m: int = 1,
    alpha: float = 0.05,
) -> DataFrame:
    denom = METRICS.mase_denominator(train_df, y=Y, series=SERIES, ds=DS, m=m)
    width = F.col("upper") - F.col("lower")
    below = (2.0 / alpha) * (F.col("lower") - F.col(Y))
    above = (2.0 / alpha) * (F.col(Y) - F.col("upper"))
    score = (
        width
        + F.when(F.col(Y) < F.col("lower"), below).otherwise(0.0)
        + F.when(F.col(Y) > F.col("upper"), above).otherwise(0.0)
    )
    return (
        results.join(denom, SERIES)
        .groupBy("model", "iteration")
        .agg(F.avg(F.try_divide(score, F.col("mase_denom"))).alias("msis"))
    )
