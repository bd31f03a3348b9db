"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real engine lives in ``capelinker_spark/`` (see SURVEY.md §2 for the
operator inventory each registered query maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: a miniature of the linkage
    pipeline over oracle-checkable data — soundex blocking between two word
    sets, Jaro-Winkler scoring (Arrow pandas UDF), dual-rank one:one
    selection — composed from the same operators the full pipeline uses."""
    from pyspark.sql import functions as F

    from capelinker_spark.entry_queries import _words
    from capelinker_spark.functions.strdist import jw_udf
    from capelinker_spark.operators.predict import rank_links, select_links
    from capelinker_spark.util import ensure_workers_importable

    ensure_workers_importable(spark)

    a = _words(spark, SF_SMOKE, ["src0", "src2", "src4"]).select(
        F.col("w").alias("word_a"), F.soundex("w").alias("block_key")
    )
    b = _words(spark, SF_SMOKE, ["src1", "src3", "src5"]).select(
        F.col("w").alias("word_b"), F.soundex("w").alias("block_key")
    )
    pairs = (
        a.join(b, "block_key")
        .withColumn("jwdist", F.round(jw_udf(F.col("word_a"), F.col("word_b")), 6))
        .withColumn("predicted", 1 - F.col("jwdist"))
    )
    ranked = rank_links(pairs, "word_a", "word_b")
    return select_links(ranked, minimum_confidence=0.5, linktype="one:one").select(
        "word_a", "word_b", "block_key", "jwdist", "predicted"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline operators: dedup / simhash / minhash-LSH /
    ANN / text analysis)."""
    from capelinker_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every query in ``queries()``. Soundex
    and Jaro-Winkler are SQL transcriptions of the exact Spark/stringdist
    semantics (capelinker_spark.entry_queries.duckdb_soundex_sql /
    duckdb_jw_sql)."""
    from capelinker_spark.entry_queries import ORACLES

    return dict(ORACLES)
