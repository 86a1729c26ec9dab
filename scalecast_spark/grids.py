"""Default hyperparameter grids (reference GridGenerator +
src/scalecast/grids/example.py — the engine ships its grids as data,
no file copying needed; GridGenerator.py:3-83 parity is the
``get_example_grids`` accessor)."""

from __future__ import annotations

DEFAULT_GRIDS: dict[str, dict] = {
    "naive": {"m": [1, 7]},
    "mlr": {"dynamic_testing": [True]},
    "ridge": {"alpha": [0.1, 1.0, 10.0]},
    "lasso": {"alpha": [0.1, 0.5, 1.0]},
    "elasticnet": {"alpha": [0.1, 1.0], "l1_ratio": [0.25, 0.5, 0.75]},
    "knn": {"n_neighbors": [3, 5, 10]},
    "gbt": {"n_estimators": [30, 60], "max_depth": [2, 3], "learning_rate": [0.05, 0.1]},
    # reference example.py:141-147 tunes n_estimators/learning_rate/gamma;
    # the numpy core adds reg_lambda (its L2 leaf knob)
    "xgboost": {
        "n_estimators": [30, 60],
        "learning_rate": [0.05, 0.1],
        "gamma": [0.0, 3.0],
        "reg_lambda": [1.0, 10.0],
    },
    "catboost": {
        "n_estimators": [30, 60],
        "max_depth": [2, 3],
        "reg_lambda": [1.0, 10.0],
    },
    "rf": {"n_estimators": [30, 60], "max_depth": [4, 6]},
    "mlp": {"hidden": [8, 16], "lr": [0.01, 0.005]},
    "hwes": {"m": [7], "seasonal": [True, False]},
    "theta": {},
}


def get_example_grids(
    overwrite: bool = False, out_name: str | None = None
) -> dict[str, dict]:
    """reference GridGenerator.get_example_grids writes a Grids.py
    FILE; the engine returns the dict directly (ingest_grid takes
    dicts or a Grids-file path). Pass ``out_name=`` to ALSO write the
    reference-shaped importable file (GridGenerator.py:33-47) — the
    dict is still returned either way."""
    if out_name is not None:
        get_grids(grid="example", out_name=out_name, overwrite=overwrite)
    return {k: dict(v) for k, v in DEFAULT_GRIDS.items()}


def get_mv_grids(
    overwrite: bool = False, out_name: str | None = None
) -> dict[str, dict]:
    """reference GridGenerator.get_mv_grids (GridGenerator.py:40-83):
    the MV example grids add a ``lags`` axis to each estimator's grid.
    Only estimators with an MV twin (a kernel factory behind ``mv_<n>``)
    get the axis — series kernels like naive/hwes/theta have no lags
    knob and would NaN every grid cell if handed one. Pass
    ``out_name=`` to ALSO write the importable MVGrids file."""
    from scalecast_spark.models import KERNEL_FACTORIES

    if out_name is not None:
        get_grids(grid="mv", out_name=out_name, overwrite=overwrite)
    out = {}
    for k, v in DEFAULT_GRIDS.items():
        g = dict(v)
        if k in KERNEL_FACTORIES:
            g["lags"] = [1, 3]
        out[k] = g
    return out


def _grid_set(name: str) -> dict[str, dict]:
    """Resolve a named grid set (the reference ships these as modules
    under src/scalecast/grids/: example, mv, empty, theta, vecm)."""
    if name == "example":
        return get_example_grids()
    if name == "mv":
        return get_mv_grids()
    if name == "empty":
        from scalecast_spark.models import MODELS

        return {k: {} for k in sorted(MODELS)}
    if name == "theta":
        # reference grids/theta.py tunes darts enum modes; the engine's
        # closed-form theta exposes m + season_mode (smoothing.py:159)
        return {"theta": {"m": [0, 7, 12], "season_mode": ["mul", "add"]}}
    if name == "vecm":
        # reference grids/vecm.py:1-5 (lags/deterministic/seasons →
        # the engine's k_ar_diff/coint_rank knobs, vecm.py:121)
        return {"vecm": {"k_ar_diff": [1, 2, 3], "coint_rank": [1, 2]}}
    raise ValueError(
        f"no grids set named {name!r} (have: example, mv, empty, theta, vecm)"
    )


def get_grids(
    grid: str = "example",
    out_name: str = "Grids.py",
    overwrite: bool = False,
) -> None:
    """Write a named grid set to an importable Grids file in the
    working directory (reference GridGenerator.get_grids,
    GridGenerator.py:3-31). The written module is plain
    ``name = {...}`` assignments, so ``Forecaster.set_grids_file``
    + ``ingest_grid('name')`` round-trips it — same contract as the
    reference's Grids.py files. No-op when the file exists and
    ``overwrite`` is False, matching the reference."""
    import os

    if not overwrite and os.path.exists(out_name):
        return
    grids = _grid_set(grid)
    lines = [
        '"""Grids file written by scalecast_spark.GridGenerator.get_grids;',
        "edit freely — Forecaster.ingest_grid('name') reads these dicts.\"\"\"",
        "",
    ]
    for name in grids:
        lines.append(f"{name} = {grids[name]!r}")
        lines.append("")
    with open(out_name, "w") as fh:
        fh.write("\n".join(lines))


def get_empty_grids(out_name: str = "Grids.py", overwrite: bool = False) -> None:
    """Empty-scaffold Grids file (reference GridGenerator.get_empty_grids,
    GridGenerator.py:68-79): one ``name = {}`` per estimator for users
    to fill in."""
    get_grids(grid="empty", out_name=out_name, overwrite=overwrite)


def gen_rnn_grid(
    layer_tries: int = 5,
    min_layer_size: int = 1,
    max_layer_size: int = 3,
    units_pool: tuple = (8, 16, 32, 64),
    lr_pool: tuple = (0.01, 0.005),
    random_seed: int | None = None,
    **kwargs,
) -> dict[str, list]:
    """Random hyperparameter grid for the 'rnn'/'lstm' estimator
    (reference util.py:1272-1359 gen_rnn_grid). The reference samples
    Keras layer structures; the TF-free direct-horizon MLP backend has
    one hidden layer, so each of the ``layer_tries`` draws samples a
    depth in [min_layer_size, max_layer_size] and that many unit sizes
    from ``units_pool``, collapsing to the equivalent single-layer
    width (sum of units). Extra kwargs become grid axes (scalars are
    wrapped in single-element lists, like the reference). Use
    ``Forecaster.limit_grid_size`` to bound the product, as the
    reference docstring advises."""
    import numpy as np

    rng = np.random.RandomState(random_seed)
    hiddens = []
    for _ in range(layer_tries):
        depth = int(rng.randint(min_layer_size, max_layer_size + 1))
        hiddens.append(int(sum(rng.choice(list(units_pool)) for _ in range(depth))))
    grid: dict[str, list] = {
        "hidden": sorted(set(hiddens)),
        "lr": list(lr_pool),
    }
    for k, v in kwargs.items():
        grid[k] = list(v) if hasattr(v, "__len__") and not isinstance(v, str) else [v]
    return grid
