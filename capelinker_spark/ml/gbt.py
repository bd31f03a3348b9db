"""Gradient-boosted match classifier (Spark ML) — the xgboost-parity path.

Mirrors the reference training setup (data_raw/pretrained.R:61-86 /
vignettes/example.rmd:142-163: binary:logistic, ~500 rounds, depth 6,
eta 0.3, subsample 0.8) with Spark ML's GBTClassifier; hyperparameters are
mapped, not copied. Defaults come from a round-2 sweep on the fixture
corpus (13 configs over maxIter 60-250 × depth 2-6 × step 0.05-0.3 ×
subsample/minInstancesPerNode): **maxIter=150, maxDepth=3, stepSize=0.1,
subsamplingRate=0.8** — held-out pair F1 0.939 (P .984 / R .899), and
0.977 after one:one rank selection on the full candidate set. That
EXCEEDS the reference's published xgboost operating point (P=.899,
R=.841, vignettes/example.rmd:151-199) but trails this engine's logistic
scorer (0.995 after selection): on these smooth monotone distance
features the logistic's extrapolation beats axis-aligned splits, deeper/
longer boosting only overfits (train F1 hits 1.0 by 60 rounds in every
config), and stacking the logistic score in as a feature makes it worse
(0.87-0.90). Documented finding: trees cannot beat logistic here; the
GBT path exists for model parity, the logistic path owns the F1 gate.

Caveats: maxIter ≳ 250 overflows the JVM stack at model serialization
(deep ML-pipeline lineage) — set ``checkpoint_interval`` (needs
``sc.setCheckpointDir``) if you must go higher. Missing values are
mean-imputed with pyspark.ml.feature.Imputer (xgboost's native-missing
behaviour approximated — documented deviation).
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
    max_iter: int = 150,
    max_depth: int = 3,
    step_size: float = 0.1,
    subsampling_rate: float = 0.8,
    min_instances_per_node: int = 1,
    checkpoint_interval: int | None = None,
    seed: int = 42,
) -> PipelineModel:
    clf = GBTClassifier(
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=step_size,
        subsamplingRate=subsampling_rate,
        minInstancesPerNode=min_instances_per_node,
        seed=seed,
    )
    if checkpoint_interval is not None:
        clf.setCheckpointInterval(checkpoint_interval)
    imputed = [f + "_imp" for f in features]
    pipeline = Pipeline(
        stages=[
            Imputer(inputCols=features, outputCols=imputed, strategy="mean"),
            VectorAssembler(inputCols=imputed, outputCol="features"),
            clf,
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
