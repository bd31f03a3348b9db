"""Sequence packing for pretraining pipelines: assign documents, in a
deterministic global order, to fixed-token-budget windows (the
"concatenate-and-chunk" step ahead of tokenizer sharding).

The math is a GLOBAL integer prefix sum of per-document token counts —
the textbook case where a naive ``Window.orderBy`` funnels the whole
table through one task (Exchange SinglePartition). Here it reuses the
distributed-offset pattern from ``blocking.sorted_neighborhood_pairs``:
range-partition by the order key, per-partition running sums on sorted
data, with cross-partition offsets cumulated through a bounded
triangular join over one row per partition and broadcast back. Every
step is partition-parallel and LAZY — no driver collect, no eager
materialization; the range exchange is shared between the totals and
final passes (ReusedExchange).

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
    # Fully LAZY distributed prefix sum (optimization round 7): the old
    # form eagerly localCheckpoint-ed the range-partitioned input and
    # collect()-ed per-partition totals to the driver at *plan build*
    # time — a whole-input materialization before the query even ran.
    # Now (1) the checkpoint is LAZY (eager=False): all passes share one
    # checkpointed RDD, so `_pid` is still a single materialized
    # assignment (range-bound sampling must not re-run per subtree —
    # re-sampling shifts boundary rows and corrupts offsets, verified at
    # sf0.1), but nothing executes until the query's own first action;
    # and (2) per-partition totals cumulate through a bounded triangular
    # join over <= n_part rows broadcast back instead of a driver
    # collect. `reliable_checkpoint=True` writes to the reliable
    # checkpoint dir for clusters with executor churn, where a lost
    # executor-local block cannot be recomputed deterministically.
    srt = (
        df.repartitionByRange(n_part, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    srt = (
        srt.checkpoint(eager=False)
        if reliable_checkpoint
        else srt.localCheckpoint(eager=False)
    )
    cnt = F.coalesce(F.col(count_col).cast("long"), F.lit(0))
    tot = srt.groupBy("_pid").agg(F.sum(cnt).alias("_t"))
    prev = tot.select(F.col("_pid").alias("_ppid"), F.col("_t").alias("_pt"))
    off_df = (
        tot.join(F.broadcast(prev), F.col("_ppid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_pt"), F.lit(0)).cast("long").alias("_off"))
    )
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
