from scalecast_spark.models.naive import naive_model
from scalecast_spark.models.linear import linear_model

#: estimator registry (the reference's cfg.py:26-54 Estimator table);
#: grows as model families land. Keys match reference nicknames.
MODELS = {
    "naive": naive_model,
    "mlr": linear_model,
}

__all__ = ["naive_model", "linear_model", "MODELS"]
