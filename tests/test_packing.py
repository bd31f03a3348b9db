"""Sequence packing: exact prefix-sum assignment, boundary convention,
parallel plan (no single-task window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from capelinker_spark.operators.packing import assign_packed_sequences


def test_packing_matches_bruteforce(spark):
    counts = [50, 100, 30, 128, 1, 0, 200, 64, 64, 9]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tokens long"
    ).repartition(5)  # deliberately scrambled input layout
    got = {
        r["doc_id"]: (r["seq_offset"], r["seq_id"])
        for r in assign_packed_sequences(df, "n_tokens", "doc_id", 128).collect()
    }
    off = 0
    for i, c in enumerate(counts):
        assert got[i] == (off, off // 128), (i, got[i], off)
        off += c
    # boundary convention: doc 1 starts at offset 50 → window 0 even though
    # it straddles into window 1; doc 3 starts at 180 → window 1
    assert got[1][1] == 0 and got[3][1] == 1


def test_packing_plan_is_parallel(spark):
    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("n_tokens")
    )
    out = assign_packed_sequences(df, "n_tokens", "doc_id", 512)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # and the ids are a contiguous range starting at 0
    agg = out.agg(
        F.min("seq_id").alias("lo"),
        F.max("seq_id").alias("hi"),
        F.countDistinct("seq_id").alias("n"),
    ).collect()[0]
    assert agg["lo"] == 0 and agg["n"] == agg["hi"] + 1
