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
    "rf": {"n_estimators": [30, 60], "max_depth": [4, 6]},
    "mlp": {"hidden": [8, 16], "lr": [0.01, 0.005]},
    "hwes": {"m": [7], "seasonal": [True, False]},
    "theta": {},
}


def get_example_grids() -> dict[str, dict]:
    return {k: dict(v) for k, v in DEFAULT_GRIDS.items()}
