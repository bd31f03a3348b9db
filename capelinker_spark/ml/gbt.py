"""Gradient-boosted match classifier (Spark ML) — the xgboost-parity path.

Mirrors the reference training setup (data_raw/pretrained.R:61-86 /
vignettes/example.rmd:142-163: binary:logistic, ~500 rounds, depth 6,
eta 0.3, subsample 0.8) with Spark ML's GBTClassifier; hyperparameters are
mapped, not copied: maxDepth=6, stepSize=0.3, subsamplingRate=0.8. Round
count is scaled down (GBT trees are costlier than xgboost's; linkage
candidate features saturate long before 500 rounds).

Missing values: features are mean-imputed with pyspark.ml.feature.Imputer
(xgboost's native-missing behaviour approximated — documented deviation).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier
from pyspark.ml.feature import Imputer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _prep(df: DataFrame, features: list[str], label_col: str | None) -> DataFrame:
    out = df
    for f in features:
        out = out.withColumn(f, F.col(f).cast(DoubleType()))
    if label_col is not None:
        out = out.withColumn("label", F.col(label_col).cast(DoubleType()))
    return out


def train_gbt(
    labeled: DataFrame,
    features: list[str],
    label_col: str = "correct",
    max_iter: int = 60,
    max_depth: int = 6,
    step_size: float = 0.3,
    subsampling_rate: float = 0.8,
    seed: int = 42,
) -> PipelineModel:
    imputed = [f + "_imp" for f in features]
    pipeline = Pipeline(
        stages=[
            Imputer(inputCols=features, outputCols=imputed, strategy="mean"),
            VectorAssembler(inputCols=imputed, outputCol="features"),
            GBTClassifier(
                maxIter=max_iter,
                maxDepth=max_depth,
                stepSize=step_size,
                subsamplingRate=subsampling_rate,
                seed=seed,
            ),
        ]
    )
    return pipeline.fit(_prep(labeled, features, label_col))


def gbt_scorer(model: PipelineModel, features: list[str]):
    """DataFrame → DataFrame adding ``predicted`` = P(link). Plugs into
    operators.predict.predict_links."""

    def score(df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        prepped = _prep(df, features, None)
        scored = model.transform(prepped)
        p1 = F.element_at(vector_to_array(F.col("probability")), 2)
        return scored.withColumn("predicted", p1).drop(
            "features", "rawPrediction", "probability", "prediction",
            *[f + "_imp" for f in features],
        )

    return score
