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
from scalecast_spark.models.trees import gbt_model, rf_model
from scalecast_spark.models.mlp import mlp_model, rnn_model
from scalecast_spark.models.arima import (
    arima_model,
    auto_arima_model,
    prophet_model,
    tbats_model,
)
from scalecast_spark.models.vecm import vecm_model
from scalecast_spark.models.svr_sgd import sgd_model, svr_model

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
    "gbt": gbt_model,
    "rf": rf_model,
    "xgboost": gbt_model,  # alias; real xgboost import-gated in trees.py
    "mlp": mlp_model,
    "rnn": rnn_model,
    "lstm": rnn_model,
    "arima": arima_model,
    "auto_arima": auto_arima_model,
    "prophet": prophet_model,
    "tbats": tbats_model,
    "vecm": vecm_model,
    "svr": svr_model,
    "sgd": sgd_model,
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
