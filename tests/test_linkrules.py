"""Deterministic cascade linkage (operators/linkrules.py): fall-through of
ambiguous records to looser passes, pool shrinkage, NULL-key non-matching,
and determinism under repartitioning."""

import pytest

from capelinker_spark.operators.linkrules import cascade_link


def _rows(df):
    return sorted(
        (r["id_from"], r["id_to"], r["pass_name"]) for r in df.collect()
    )


def test_cascade_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, "smith", 1850), (2, "smith", 1851), (3, "jones", 1850)],
        "id_from long, name string, year int",
    )
    right = spark.createDataFrame(
        [
            (11, "smith", 1850),
            (12, "smith", 1851),
            (13, "smith", 1850),
            (14, "jones", 1852),
        ],
        "id_to long, name string, year int",
    )
    out = cascade_link(
        left,
        right,
        [("exact", ["name", "year"]), ("name_only", ["name"])],
    )
    # pass 1: left 1 sees right {11,13} -> ambiguous, falls through;
    #         (2,12) unambiguous both sides -> matched strict.
    # pass 2 (2/12 removed): left 1 still sees {11,13} -> stays unlinked;
    #         (3,14) unique on name -> matched loose.
    assert _rows(out) == [(2, 12, "exact"), (3, 14, "name_only")]


def test_cascade_matched_records_leave_the_pool(spark):
    """A record matched by a strict pass must NOT resurface in a looser
    pass even where it would be unambiguous there."""
    left = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2)], "id_from long, k string, y int"
    )
    right = spark.createDataFrame(
        [(11, "a", 1)], "id_to long, k string, y int"
    )
    out = cascade_link(left, right, [("p1", ["k", "y"]), ("p2", ["k"])])
    # p1 matches (1,11); p2 then sees only left 2 vs empty right pool
    assert _rows(out) == [(1, 11, "p1")]


def test_cascade_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, 1850)], "id_from long, name string, year int"
    )
    right = spark.createDataFrame(
        [(11, None, 1850)], "id_to long, name string, year int"
    )
    out = cascade_link(
        left, right, [("exact", ["name", "year"]), ("loose", ["name"])]
    )
    assert out.count() == 0


def test_cascade_duplicate_pass_names_raise(spark):
    df = spark.createDataFrame([(1, "a")], "id_from long, k string")
    with pytest.raises(ValueError, match="duplicate pass names"):
        cascade_link(df, df.withColumnRenamed("id_from", "id_to"),
                     [("p", ["k"]), ("p", ["k"])])


def test_cascade_deterministic_under_partitioning(spark):
    import random

    rng = random.Random(7)
    names = [f"n{rng.randrange(40)}" for _ in range(300)]
    left = spark.createDataFrame(
        [(i, names[i], 1850 + i % 3) for i in range(300)],
        "id_from long, name string, year int",
    )
    right = spark.createDataFrame(
        [(1000 + i, names[(i * 7) % 300], 1850 + (i * 7) % 3)
         for i in range(300)],
        "id_to long, name string, year int",
    )
    passes = [("strict", ["name", "year"]), ("loose", ["name"])]
    a = _rows(cascade_link(left, right, passes))
    b = _rows(
        cascade_link(left.repartition(13), right.repartition(3), passes)
    )
    assert a == b and len(a) > 0
