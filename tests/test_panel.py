"""Panel linkage: multi-year corpus, wave-by-wave linking, cluster quality
on the full panel (the reference's end-to-end use case, SURVEY §3.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capelinker_spark.fixtures import make_corpus, pages_df, truth_df
from capelinker_spark.pipeline import LinkagePipeline, PipelineConfig


@pytest.fixture(scope="module")
def panel(spark):
    corpus = make_corpus(n_entities=200, years=(1824, 1826, 1828), seed=7)
    return (
        pages_df(spark, corpus["pages"]).cache(),
        truth_df(spark, corpus["truth"]).cache(),
    )


def _cluster_pair_f1(clusters, truth):
    """Pairwise F1 of the induced entity clustering vs hidden truth,
    restricted to cross-year record pairs (the linkable ones)."""
    c = clusters.select("persid", "entity_id")
    t = truth.select("persid", F.col("entity_id").alias("true_id"), "year")
    j = c.join(t, "persid")
    a = j.select(
        F.col("persid").alias("pa"), F.col("entity_id").alias("ca"),
        F.col("true_id").alias("ta"), F.col("year").alias("ya"),
    )
    b = j.select(
        F.col("persid").alias("pb"), F.col("entity_id").alias("cb"),
        F.col("true_id").alias("tb"), F.col("year").alias("yb"),
    )
    pairs = a.join(b, (F.col("pa") < F.col("pb")) & (F.col("ya") != F.col("yb")))
    agg = pairs.agg(
        F.sum(((F.col("ca") == F.col("cb")) & (F.col("ta") == F.col("tb"))).cast("long")).alias("tp"),
        F.sum(((F.col("ca") == F.col("cb")) & (F.col("ta") != F.col("tb"))).cast("long")).alias("fp"),
        F.sum(((F.col("ca") != F.col("cb")) & (F.col("ta") == F.col("tb"))).cast("long")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0, tp, fp, fn


def test_panel_linkage(spark, panel, tmp_path_factory):
    pages, truth = panel
    wd = str(tmp_path_factory.mktemp("panel"))
    pipe = LinkagePipeline(spark, wd, PipelineConfig())
    res = pipe.run_panel(pages, truth, resume=False)

    # every record clustered
    n_rec = res["records"].count()
    assert res["clusters"].count() == n_rec

    # panel entity quality: cross-year pairwise F1 of the induced clusters
    f1, tp, fp, fn = _cluster_pair_f1(res["clusters"], truth)
    assert tp > 150
    assert f1 >= 0.9, (f1, tp, fp, fn)

    # entities observed in all three years end up in ONE cluster (transitive
    # closure across waves — the expand_index fixpoint)
    three_year = (
        truth.groupBy("entity_id")
        .agg(F.countDistinct("year").alias("ny"), F.collect_set("persid").alias("ps"))
        .where(F.col("ny") == 3)
    ).collect()
    cl = {r["persid"]: r["entity_id"] for r in res["clusters"].collect()}
    fully_merged = sum(
        1 for r in three_year if len({cl[p] for p in r["ps"]}) == 1
    )
    assert fully_merged / max(len(three_year), 1) >= 0.6
