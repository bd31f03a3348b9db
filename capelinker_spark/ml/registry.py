"""Pretrained-model registry — the ``pretrained_models`` list analog
(data_raw/pretrained.R:489-513; lookup-by-modstring at R/pred.R:40).

The reference ships six fitted models keyed by name, each carrying its
``variables`` list; this registry carries the same names + feature lists
(from qa.preflight.MODEL_VARIABLES) and trains/loads the engine's scorers
for them. Fitted weights are NOT copied from the reference (its .rda
binaries are its own training output); parity is architectural: same names,
same feature sets, same training recipe (grouped split + boosted/logistic
fit), validated by the F1 gates in tests/.
"""

from __future__ import annotations

import os

import pandas as pd

from capelinker_spark.ml.logistic import LogisticModel, train_logistic
from capelinker_spark.qa.preflight import MODEL_VARIABLES


def model_features(modstring: str) -> list[str]:
    """Feature list of a registry model (R/pred.R:40 lookup)."""
    if modstring not in MODEL_VARIABLES:
        raise KeyError(
            f"unknown pretrained model {modstring!r}; "
            f"known: {sorted(MODEL_VARIABLES)}"
        )
    return list(MODEL_VARIABLES[modstring])


def train_registry_model(
    modstring: str, labeled: pd.DataFrame, label_col: str = "correct", seed: int = 42
) -> LogisticModel:
    """Fit the engine's scorer for a registry model name, using exactly the
    features that model declares (missing columns are dropped with the same
    tolerance ``preflight`` reports on)."""
    feats = [f for f in model_features(modstring) if f in labeled.columns]
    if not feats:
        raise ValueError(f"none of {modstring}'s features present in the frame")
    return train_logistic(labeled, feats, label_col=label_col, seed=seed)


class ModelStore:
    """Directory of named fitted models (the data/pretrained_models.rda
    analog): save/load LogisticModel JSONs by modstring."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, modstring: str) -> str:
        return os.path.join(self.root, f"{modstring}.json")

    def save(self, modstring: str, model: LogisticModel) -> None:
        model.save(self._path(modstring))

    def load(self, modstring: str) -> LogisticModel:
        p = self._path(modstring)
        if not os.path.exists(p):
            raise KeyError(f"no fitted model {modstring!r} in {self.root}")
        return LogisticModel.load(p)

    def names(self) -> list[str]:
        return sorted(
            f[: -len(".json")] for f in os.listdir(self.root) if f.endswith(".json")
        )
