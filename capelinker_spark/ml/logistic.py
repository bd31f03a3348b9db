"""Driver-trained logistic match classifier → native scoring expression.

The reference trains xgboost / randomForest on a SMALL labeled candidate set
(454 link pairs in rein — vignettes/example.rmd:51-56) and scores millions of
pairs with it (M1, R/pred.R:43-45). The Spark-shaped equivalent: collect the
labeled pairs to the driver (they are tiny by construction), fit there, and
score cluster-side. This logistic scorer compiles to a PURE NATIVE column
expression — sigmoid(w·x) via F.exp — so the scoring path has zero Python.
A GBT alternative (capelinker_spark.ml.gbt) covers the boosted-tree parity.

Missing features are mean-imputed (training means are baked into the
expression); xgboost's native missing handling is approximated by the
imputation + the classifier seeing the same treatment at train and at
score time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LogisticModel:
    features: list[str]
    weights: np.ndarray  # shape (len(features),)
    bias: float
    means: np.ndarray  # imputation values, shape (len(features),)
    stds: np.ndarray = field(default=None)  # feature scaling

    def expr(self) -> Column:
        """Native scoring expression: sigmoid(b + Σ wᵢ·(impute(xᵢ)-μᵢ)/σᵢ)."""
        z = F.lit(float(self.bias))
        for i, name in enumerate(self.features):
            c = F.col(name).cast("double")
            # impute both NULL and NaN (Spark distinguishes them; pandas NaN
            # arrives as NaN, UDF None as NULL)
            x = F.when(
                c.isNull() | F.isnan(c), F.lit(float(self.means[i]))
            ).otherwise(c)
            x = (x - F.lit(float(self.means[i]))) / F.lit(float(self.stds[i]))
            z = z + F.lit(float(self.weights[i])) * x
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def transform(self, df: DataFrame, out: str = "predicted") -> DataFrame:
        return df.withColumn(out, self.expr())

    def save(self, path: str) -> None:
        """Persist as JSON (the ``pretrained_models`` .rda analog,
        data_raw/pretrained.R:489-513 — name + variables + weights)."""
        import json

        with open(path, "w") as fh:
            json.dump(
                {
                    "features": self.features,
                    "weights": list(map(float, self.weights)),
                    "bias": self.bias,
                    "means": list(map(float, self.means)),
                    "stds": list(map(float, self.stds)),
                },
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "LogisticModel":
        import json

        with open(path) as fh:
            d = json.load(fh)
        return cls(
            features=d["features"],
            weights=np.array(d["weights"]),
            bias=d["bias"],
            means=np.array(d["means"]),
            stds=np.array(d["stds"]),
        )

    def predict_pdf(self, pdf: pd.DataFrame) -> np.ndarray:
        x = pdf[self.features].to_numpy(dtype="float64")
        x = np.where(np.isnan(x), self.means, x)
        x = (x - self.means) / self.stds
        z = x @ self.weights + self.bias
        return 1.0 / (1.0 + np.exp(-z))


def train_logistic(
    labeled: pd.DataFrame,
    features: list[str],
    label_col: str = "correct",
    l2: float = 1e-3,
    lr: float = 0.5,
    iterations: int = 500,
    seed: int = 42,
) -> LogisticModel:
    """Deterministic full-batch gradient-descent logistic regression (numpy;
    no sklearn dependency). ``labeled`` is a small driver-side frame."""
    x = labeled[features].to_numpy(dtype="float64")
    y = labeled[label_col].to_numpy(dtype="float64")
    means = np.nanmean(x, axis=0)
    means = np.where(np.isnan(means), 0.0, means)
    stds = np.nanstd(x, axis=0)
    stds = np.where((stds == 0) | np.isnan(stds), 1.0, stds)
    x = np.where(np.isnan(x), means, x)
    x = (x - means) / stds

    rng = np.random.default_rng(seed)
    w = rng.normal(0, 0.01, size=x.shape[1])
    b = 0.0
    n = len(y)
    # class weighting: candidate sets are ~1:20 imbalanced (BASELINE.md)
    pos = max(y.sum(), 1.0)
    neg = max(n - y.sum(), 1.0)
    sw = np.where(y == 1, n / (2 * pos), n / (2 * neg))
    for _ in range(iterations):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = (p - y) * sw
        gw = x.T @ g / n + l2 * w
        gb = g.mean()
        w -= lr * gw
        b -= lr * gb
    return LogisticModel(
        features=list(features), weights=w, bias=float(b), means=means, stds=stds
    )
