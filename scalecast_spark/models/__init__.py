from scalecast_spark.models.naive import naive_model
from scalecast_spark.models.linear import linear_model
from scalecast_spark.models.sklearn_like import (
    elasticnet_model,
    knn_model,
    lasso_model,
    mlr_model,
    ridge_model,
)
from scalecast_spark.models.smoothing import hwes_model, theta_model

#: estimator registry (the reference's cfg.py:26-54 Estimator table);
#: keys match reference nicknames. Every entry is
#: (df, features=..., **hyperparams) -> df + 'forecast'.
MODELS = {
    "naive": naive_model,
    "mlr": linear_model,
    "ridge": ridge_model,
    "lasso": lasso_model,
    "elasticnet": elasticnet_model,
    "knn": knn_model,
    "hwes": hwes_model,
    "theta": theta_model,
}


def add_estimator(name: str, fn) -> None:
    """User extensibility (reference add_sklearn_estimator,
    _Forecaster_parent.py:786-814)."""
    MODELS[name] = fn


__all__ = [
    "naive_model", "linear_model", "mlr_model", "ridge_model",
    "lasso_model", "elasticnet_model", "knn_model", "hwes_model",
    "theta_model", "MODELS", "add_estimator",
]
