"""Entity clustering: ``expand_index`` semantics + transitive closure.

``expand_index`` (R/util.R:14-44) folds one wave of proposed links into an
existing entity index; iterated across waves it is connected components.
Here both are provided: the exact single-wave semantics as native window
expressions, and full connected components as iterative min-label
propagation (hash joins) with deterministic min-id tie-breaking and
checkpointing per iteration to truncate lineage (north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expand_index(
    dat: DataFrame,
    index_col: str = "index",
    candidate_col: str = "index_candidate",
) -> DataFrame:
    """Exact R/util.R:14-44 semantics, per candidate group (NULL candidates
    untouched):

    * group entirely unindexed → adopt the candidate index (:17-21)
    * group fully indexed → no-op (:23-28)
    * group bridges exactly ONE existing index + NAs → fill the NAs (:30-37)
    * ≥2 distinct existing indexes → left as-is (no bridging across entities)
    """
    w = Window.partitionBy(candidate_col)
    idx = F.col(index_col)
    nn_distinct = F.size(F.collect_set(idx).over(w))  # collect_set skips NULLs
    has_null = F.max(idx.isNull().cast("int")).over(w)
    the_idx = F.min(idx).over(w)
    new_index = (
        F.when(F.col(candidate_col).isNull(), idx)
        .when(nn_distinct == 0, F.col(candidate_col))
        .when((has_null == 1) & (nn_distinct == 1) & idx.isNull(), the_idx)
        .otherwise(idx)
    )
    return dat.withColumn(index_col, new_index)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Min-label propagation: returns (node, component) with component =
    min node id reachable — the deterministic min-id tie-break.

    Each iteration: every node takes the min of its own label and its
    neighbors' labels (one shuffle join + one aggregation); converges in
    O(component diameter) rounds. Linkage components are near-cliques of a
    handful of records, so 3-6 rounds in practice; ``localCheckpoint`` per
    round truncates lineage so plans stay flat at any scale.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def cluster_links(
    links: DataFrame,
    records: DataFrame,
    id_from: str = "persid_from",
    id_to: str = "persid_to",
    record_id: str = "persid",
    score_col: str = "predicted",
) -> DataFrame:
    """Accepted links → entity table (FIXTURES.md §5 contract):
    (persid, entity_id, confidence). Unlinked records become singleton
    entities (their own id). confidence = max accepted-link score touching
    the record (NULL for singletons)."""
    edges = links.select(F.col(id_from).alias("src"), F.col(id_to).alias("dst"))
    comp = connected_components(edges)
    conf = (
        links.select(F.col(id_from).alias("node"), F.col(score_col).alias("s"))
        .union(links.select(F.col(id_to).alias("node"), F.col(score_col).alias("s")))
        .groupBy("node")
        .agg(F.max("s").alias("confidence"))
    )
    out = (
        records.select(F.col(record_id).alias("persid"))
        .join(comp.withColumnRenamed("node", "persid"), "persid", "left")
        .join(conf.withColumnRenamed("node", "persid"), "persid", "left")
        .withColumn("entity_id", F.coalesce(F.col("component"), F.col("persid")))
        .drop("component")
    )
    return out
