"""MLlib global-model backend (SURVEY.md §2.8 'MLlib where scale is
required' and BASELINE.json's 'MLlib pipelines' approach).

The numpy kernels fit ONE MODEL PER SERIES — right when series are many
and independent. This backend fits ONE POOLED MODEL across all series'
rows (VectorAssembler → MLlib estimator), the right strategy when
series are numerous but SHORT (cross-learning) or when a single model
must see billions of rows. That is a different statistical model than
the reference's per-series fits — offered as an explicit backend
choice, not a silent substitution.

Prediction here is feature-driven (one-step / exogenous); recursive
multi-step AR prediction stays in the per-series kernel where the
sequential loop lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scalecast_spark.frame import DS, IS_FUTURE, SERIES, Y


def _assemble(df: DataFrame, features: list[str]):
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(
        inputCols=list(features), outputCol="_features", handleInvalid="skip"
    )
    return asm, asm.transform(df.dropna(subset=list(features)))


def global_linear_model(
    df: DataFrame, features: list[str], elastic_net: float = 0.0,
    reg: float = 0.0, **_,
) -> DataFrame:
    """Pooled MLlib LinearRegression across all series."""
    from pyspark.ml.regression import LinearRegression

    asm, assembled = _assemble(df, features)
    train = assembled.filter((F.col(IS_FUTURE) == 0) & F.col(Y).isNotNull())
    lr = LinearRegression(
        featuresCol="_features", labelCol=Y,
        elasticNetParam=elastic_net, regParam=reg,
    )
    model = lr.fit(train)
    scored = model.transform(assembled).withColumnRenamed("prediction", "forecast")
    return df.join(
        scored.select(SERIES, DS, "forecast"), [SERIES, DS], "left"
    )


def global_gbt_model(
    df: DataFrame, features: list[str], max_iter: int = 30,
    max_depth: int = 4, **_,
) -> DataFrame:
    """Pooled MLlib GBTRegressor — distributed tree boosting over the
    full corpus (the 100 TB pooled-model path)."""
    from pyspark.ml.regression import GBTRegressor

    asm, assembled = _assemble(df, features)
    train = assembled.filter((F.col(IS_FUTURE) == 0) & F.col(Y).isNotNull())
    gbt = GBTRegressor(
        featuresCol="_features", labelCol=Y, maxIter=max_iter, maxDepth=max_depth,
        seed=42,
    )
    model = gbt.fit(train)
    scored = model.transform(assembled).withColumnRenamed("prediction", "forecast")
    return df.join(
        scored.select(SERIES, DS, "forecast"), [SERIES, DS], "left"
    )


def feature_importance(
    df: DataFrame,
    features: list[str],
    model_fn,
    n_rounds: int = 3,
    seed: int = 42,
    **model_kwargs,
) -> DataFrame:
    """Permutation feature importance (reference save_feature_importance,
    Forecaster.py:1531-1673, uses SHAP; permutation importance is the
    library-free standard): RMSE degradation on the observed rows when
    one feature column is shuffled. Shuffling = reassigning each row the
    feature value of a random other row via a seeded rand() sort — fully
    distributed."""
    from pyspark.sql import Window as W

    base = model_fn(df, features=features, **model_kwargs)
    obs = base.filter((F.col(IS_FUTURE) == 0) & F.col("forecast").isNotNull())
    base_rmse = obs.agg(
        F.sqrt(F.avg(F.pow(F.col("forecast") - F.col(Y), 2.0)))
    ).collect()[0][0]
    rows = []
    for feat in features:
        degr = 0.0
        for r in range(n_rounds):
            w_rand = W.partitionBy(SERIES).orderBy(F.rand(seed + r))
            w_orig = W.partitionBy(SERIES).orderBy(DS)
            shuffled_vals = (
                df.withColumn("_rn", F.row_number().over(w_rand))
                .select(SERIES, "_rn", F.col(feat).alias("_shuf"))
            )
            keyed = df.withColumn("_rn", F.row_number().over(w_orig))
            permuted = (
                keyed.drop(feat)
                .join(shuffled_vals, [SERIES, "_rn"])
                .withColumnRenamed("_shuf", feat)
                .drop("_rn")
            )
            scored = model_fn(permuted, features=features, **model_kwargs)
            obs_p = scored.filter(
                (F.col(IS_FUTURE) == 0) & F.col("forecast").isNotNull()
            )
            rmse_p = obs_p.agg(
                F.sqrt(F.avg(F.pow(F.col("forecast") - F.col(Y), 2.0)))
            ).collect()[0][0]
            degr += float(rmse_p) - float(base_rmse)
        rows.append((feat, degr / n_rounds))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, schema="feature string, importance double"
    ).orderBy(F.desc("importance"))
