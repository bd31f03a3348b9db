"""Classifier-parity path: Spark ML GBT (the xgboost analog, M5) reaches the
same F1 gate as the logistic scorer on the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capelinker_spark.extract import extract_records
from capelinker_spark.ml.gbt import gbt_scorer, train_gbt
from capelinker_spark.operators.candidates import candidates_multikey
from capelinker_spark.operators.features import add_matches, add_wifeinboth, distcalc
from capelinker_spark.operators.predict import (
    confusion,
    group_split,
    predict_links,
)

FEATURES = [
    "mlastdist", "mfirstdist", "wlastdist", "wfirstdist",
    "minitialsdist", "mlastsdx", "mfirstsdx", "mfullnamedist", "matches",
    "cattle_reldist", "sheep_reldist", "horses_reldist",
    "wlastdist_missing", "wfirstdist_missing", "mfirstdist_missing",
]


@pytest.fixture(scope="module")
def labeled_features(spark, pages, truth):
    records = extract_records(pages, with_spousenamedist=False).cache()
    keys = [
        lambda df: F.soundex(F.col("mlast")),
        lambda df: F.soundex(F.col("mlast_woprefix")),
        lambda df: F.soundex(F.col("mfirst")),
    ]
    cnd = candidates_multikey(
        records.where(F.col("year") == 1828),
        records.where(F.col("year") == 1826),
        keys,
        keep_unmatched="none",
    )
    feats = distcalc(
        cnd,
        character_variables=(
            "mlast", "mfirst", "wlast", "wfirst", "minitials", "mfullname",
        ),
        numeric_variables=("year",),
    )
    feats = add_matches(feats, "persid_from")
    feats = add_wifeinboth(feats)
    from capelinker_spark.pipeline import add_rel_deltas

    feats = add_rel_deltas(feats)
    for v in ("wlastdist", "wfirstdist", "mfirstdist"):
        feats = feats.withColumn(f"{v}_missing", F.col(v).isNull().cast("double"))
    t_from = truth.select(
        F.col("persid").alias("persid_from"), F.col("entity_id").alias("_ef")
    )
    t_to = truth.select(
        F.col("persid").alias("persid_to"), F.col("entity_id").alias("_et")
    )
    return (
        feats.join(t_from, "persid_from")
        .join(t_to, "persid_to")
        .withColumn("correct", F.col("_ef") == F.col("_et"))
        .cache()
    )


def test_gbt_f1_gate(spark, labeled_features):
    """GBT is the boosted-tree parity path (xgboost analog). With the
    sweep-tuned defaults (150 rounds, depth 3, step 0.1) it reaches ~0.94
    held-out pair F1 and ~0.98 after one:one selection — above the
    reference's published xgboost operating point (P=.899/R=.841,
    vignettes/example.rmd:151-199) but below this engine's logistic
    (0.995): the documented trees-can't-beat-logistic finding
    (ml/gbt.py module docstring). The production 0.99 gate runs on the
    logistic pipeline (tests/test_pipeline.py)."""
    train, test = group_split(labeled_features, "persid_from", 0.7, seed=1)
    model = train_gbt(train, FEATURES, seed=42)  # tuned defaults
    scorer = gbt_scorer(model, FEATURES)
    m = confusion(scorer(test))
    assert m["f1"] >= 0.93, m
    # one:one selection: rank-based, threshold-insensitive
    links = predict_links(
        labeled_features, "persid_from", "persid_to", scorer,
        minimum_confidence=0.5, linktype="one:one",
    )
    sel = links.select("correct").collect()
    tp = sum(1 for r in sel if r["correct"])
    precision = tp / max(len(sel), 1)
    positives = labeled_features.where("correct").count()
    recall = tp / max(positives, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert f1 >= 0.96, (precision, recall, f1)
    assert len(sel) > 150
