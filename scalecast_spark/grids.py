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


def get_example_grids(overwrite: bool = False, **_ref_kwargs) -> dict[str, dict]:
    """reference GridGenerator.get_example_grids writes a Grids.py
    FILE; the engine returns the dict directly (ingest_grid takes
    dicts or a Grids-file path), so ``overwrite`` is accepted for
    call-shape parity and has nothing to overwrite."""
    return {k: dict(v) for k, v in DEFAULT_GRIDS.items()}


def get_mv_grids(overwrite: bool = False, **_ref_kwargs) -> dict[str, dict]:
    """reference GridGenerator.get_mv_grids (GridGenerator.py:40-83):
    the MV example grids add a ``lags`` axis to each estimator's grid.
    Only estimators with an MV twin (a kernel factory behind ``mv_<n>``)
    get the axis — series kernels like naive/hwes/theta have no lags
    knob and would NaN every grid cell if handed one."""
    from scalecast_spark.models import KERNEL_FACTORIES

    out = {}
    for k, v in DEFAULT_GRIDS.items():
        g = dict(v)
        if k in KERNEL_FACTORIES:
            g["lags"] = [1, 3]
        out[k] = g
    return out


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
