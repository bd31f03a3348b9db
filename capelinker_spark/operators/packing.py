"""Sequence packing for pretraining pipelines: assign documents, in a
deterministic global order, to fixed-token-budget windows (the
"concatenate-and-chunk" step ahead of tokenizer sharding).

The math is a GLOBAL integer prefix sum of per-document token counts —
the textbook case where a naive ``Window.orderBy`` funnels the whole
table through one task (Exchange SinglePartition). Here it reuses the
distributed-offset pattern from ``blocking.sorted_neighborhood_pairs``:
range-partition by the order key, per-partition running sums on sorted
data, then one bounded collect of per-partition totals broadcast back as
offsets. Every step is partition-parallel; the only driver data is one
row per partition.

Exactness: counts and prefix sums are LONGS; the window id is integer
division — bit-identical to a SQL ``SUM() OVER (ORDER BY ...)`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_packed_sequences(
    df: DataFrame,
    count_col: str,
    order_col: str,
    tokens_per_seq: int,
    out: str = "seq_id",
    offset_out: str | None = "seq_offset",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Greedy contiguous packing: documents ordered by ``order_col`` (must
    be a unique key — ties would make the global order, and therefore the
    packing, nondeterministic) fill windows of ``tokens_per_seq`` tokens;
    a document straddling a boundary belongs to the window containing its
    FIRST token (``seq_id = start_offset div cap``), the standard
    split-on-boundary convention.

    Adds ``out`` (window id) and, unless ``offset_out=None``, the
    document's global start offset in tokens.

    NULL ``count_col`` values count as 0 (the document occupies no tokens
    but still gets the offset/window of its position). Without the
    coalesce, a NULL count would propagate NULL into ``_start``/``seq_id``
    for that row AND silently shift every later offset (SUM skips NULLs),
    breaking the exact-long contract."""
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # checkpoint, not persist: both passes (totals collect + window) must
    # see identical partition boundaries, AND the blocks are cleaned by
    # the ContextCleaner once the frame is garbage-collected — persist()
    # would pin one copy of the input per call for the whole session
    # (round-3 review finding). ``reliable_checkpoint=True`` uses the
    # reliable checkpoint dir for clusters with executor churn, where a
    # lost executor-local block is unrecoverable through truncated lineage
    srt = (
        df.repartitionByRange(n_part, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    srt = (
        srt.checkpoint(eager=True)
        if reliable_checkpoint
        else srt.localCheckpoint(eager=True)
    )
    cnt = F.coalesce(F.col(count_col).cast("long"), F.lit(0))
    totals = sorted(
        (r["_pid"], r["_t"])
        for r in srt.groupBy("_pid").agg(F.sum(cnt).alias("_t")).collect()
    )
    offsets, acc = [], 0
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += t or 0
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_end = F.col("_off") + F.sum(cnt).over(w)
    start = (cum_end - cnt).alias("_start")
    out_df = (
        srt.join(F.broadcast(off_df), "_pid")
        .withColumn("_start", start)
        .withColumn(out, F.expr(f"_start div {int(tokens_per_seq)}"))
    )
    if offset_out:
        out_df = out_df.withColumnRenamed("_start", offset_out)
    else:
        out_df = out_df.drop("_start")
    return out_df.drop("_pid", "_off")
