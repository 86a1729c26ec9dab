"""Notebook result browsers — the reference's ipywidgets tier
(``results_vis`` / ``results_vis_mv``, reference
src/scalecast/notebook.py:10-187) over the engine's distributed plot
frames.

Widget wiring mirrors the reference (time-series dropdown, top-N model
count, exclude multiselect, CI toggle, order-by metric, a button that
redraws); the data each redraw pulls is a plot FRAME computed as one
Spark plan (plotting.forecast_plot_frame / test_set_plot_frame), so
browsing a million-series Forecaster costs one reduced-payload job per
click, never a corpus collect.

ipywidgets/IPython are import-gated like matplotlib in plotting.py:
headless (this container, CI, spark-submit) the functions warn and
render the first selection statically — the notebooks-only dependency
never gates the engine.
"""

from __future__ import annotations

import warnings

from scalecast_spark.forecaster import Forecaster


def _widgets():
    try:  # pragma: no cover - env-dependent
        import ipywidgets as widgets
        from IPython.display import clear_output, display

        return widgets, display, clear_output
    except ImportError:
        return None, None, None


def _draw(f: Forecaster, plot_type: str, n_top: int, exclude, ci, order_by):
    ranked = [m for m in f.order_fcsts(order_by) if m not in set(exclude)]
    models = ranked[: max(n_top, 1)] or None
    if plot_type == "forecast":
        return f.plot(models=models, ci=ci)
    return f.plot_test_set(models=models)


def results_vis(
    f_dict: dict[str, Forecaster],
    plot_type: str = "forecast",
    include_train: bool = True,
):
    """Browse forecast / test-set results across many Forecaster
    objects (reference notebook.results_vis, notebook.py:10-102).

    With ipywidgets available, renders the reference's control panel
    (series dropdown, No. Models, Exclude, CI, Order By + redraw
    button). Headless, warns and renders the first dictionary entry's
    top models statically — returning that plot frame so the caller
    still gets the data either way.
    """
    if plot_type not in ("forecast", "test"):
        raise ValueError(
            f'plot_type must be "forecast" or "test", got {plot_type!r}'
        )
    if not f_dict:
        raise ValueError("results_vis: f_dict is empty")
    widgets, display, clear_output = _widgets()
    all_models: list[str] = []
    for f in f_dict.values():
        all_models += [m for m in f.history if m not in all_models]
    metrics = sorted(
        {
            k
            for f in f_dict.values()
            for h in f.history.values()
            for k in h["summary"]
            if k.startswith("TestSet")
        }
    ) or ["TestSetRMSE"]
    if widgets is None:
        warnings.warn(
            "ipywidgets/IPython not installed — interactive browser "
            "skipped; rendering the first entry statically"
        )
        first = next(iter(f_dict.values()))
        return _draw(
            first, plot_type, len(all_models), (), False, metrics[0]
        )

    ts_dd = widgets.Dropdown(options=list(f_dict), description="Time Series:")
    mo_dd = widgets.Dropdown(
        options=range(1, len(all_models) + 1), description="No. Models"
    )
    ex_se = widgets.SelectMultiple(options=all_models, description="Exclude")
    ci_dd = widgets.Dropdown(
        options=[False, True], description="View Confidence Intervals"
    )
    me_dd = widgets.Dropdown(options=metrics, description="Order By")
    button = widgets.Button(description="Select Time Series")
    output = widgets.Output()

    def on_click(_):
        with output:
            clear_output()
            _draw(
                f_dict[ts_dd.value], plot_type, mo_dd.value,
                ex_se.value, ci_dd.value, me_dd.value,
            )

    display(ts_dd, mo_dd, ex_se, ci_dd, me_dd)
    display(button, output)
    button.on_click(on_click)


def results_vis_mv(
    f_dict: dict[str, Forecaster],
    plot_type: str = "forecast",
    include_train: bool = True,
):
    """MV twin of :func:`results_vis` (reference notebook.py:104-187).
    The engine's long format makes an MVForecaster just a Forecaster
    whose frame holds every series, so the same browser applies — kept
    as a separate name for reference API parity."""
    return results_vis(f_dict, plot_type, include_train)
