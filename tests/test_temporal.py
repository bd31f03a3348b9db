"""As-of join (operators/temporal.py): hand-computed backward-asof
semantics, inclusive ties, duplicate-timestamp tiebreak, multi-key,
column-collision suffixing, and the one-shuffle plan shape."""

from pyspark.sql import functions as F

from capelinker_spark.operators.temporal import asof_join


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_basic_backward(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 5), ("b", 7)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("a", 10, "x"), ("a", 15, "y"), ("b", 9, "z")],
        "k string, rt long, val string",
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    # t=10 matches rt=10 (ties inclusive), t=20 -> rt=15, t=5 and b/7 -> NULL
    assert _rows(out, "k", "t", "val") == [
        ("a", 5, None),
        ("a", 10, "x"),
        ("a", 20, "y"),
        ("b", 7, None),
    ]


def test_asof_tiebreak_highest_wins(spark):
    left = spark.createDataFrame([("a", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 10, 1, "lo"), ("a", 10, 2, "hi")],
        "k string, rt long, rid int, val string",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", tiebreak="rid"
    )
    assert _rows(out, "k", "t", "rid", "val") == [("a", 10, 2, "hi")]


def test_asof_multikey_and_suffix(spark):
    left = spark.createDataFrame(
        [("a", 1, 10, "L")], "k string, g int, t long, v string"
    )
    right = spark.createDataFrame(
        [("a", 1, 9, "R1"), ("a", 2, 9, "R2")],
        "k string, g int, rt long, v string",
    )
    out = asof_join(
        left, right, on=["k", "g"], left_time="t", right_time="rt"
    )
    rows = out.collect()
    assert len(rows) == 1
    # left payload kept verbatim; colliding right column suffixed
    assert rows[0]["v"] == "L" and rows[0]["v_r"] == "R1"


def test_asof_left_rows_never_dropped_or_duplicated(spark):
    left = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("t")
    )
    right = spark.range(40).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") * 4).alias("rt"),
        F.col("id").alias("payload"),
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    assert out.count() == 50
    # every non-null match satisfies rt <= t and is the max such rt
    matched = out.select("k", "t", F.col("rt").alias("mrt"))
    bad = matched.join(right, "k").where(
        F.col("mrt").isNotNull()
        & (F.col("rt") <= F.col("t"))
        & (F.col("rt") > F.col("mrt"))
    )
    assert bad.count() == 0


def test_asof_plan_single_shuffle_no_python(spark):
    left = spark.createDataFrame([("a", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 9, 1.0)], "k string, rt long, val double"
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-tag-window form: ONE hash exchange on the key, no join at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_asof_forward_direction(spark):
    import pytest

    left = spark.createDataFrame(
        [("a", 10), ("a", 3), ("a", 20)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("a", 10, "x"), ("a", 15, "y")], "k string, rt long, val string"
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        direction="forward",
    )
    # t=10 -> rt=10 (inclusive), t=3 -> rt=10 (nearest later), t=20 -> NULL
    assert _rows(out, "t", "val") == [(3, "x"), (10, "x"), (20, None)]

    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on="k", left_time="t", right_time="rt",
                  direction="nearest")


def test_asof_tolerance_both_directions(spark):
    left = spark.createDataFrame(
        [("a", 20), ("a", 25)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("a", 5, "z"), ("a", 18, "w")], "k string, rt long, val string"
    )
    back = asof_join(
        left, right, on="k", left_time="t", right_time="rt", tolerance=2
    )
    # t=20: rt=18, gap 2 <= 2 -> kept; t=25: rt=18, gap 7 -> nulled
    assert _rows(back, "t", "val") == [(20, "w"), (25, None)]

    fleft = spark.createDataFrame(
        [("a", 3), ("a", 14)], "k string, t long"
    )
    fwd = asof_join(
        fleft, right, on="k", left_time="t", right_time="rt",
        direction="forward", tolerance=5,
    )
    # t=3: next rt=5, gap 2 -> kept; t=14: next rt=18, gap 4 <= 5 -> kept
    assert _rows(fwd, "t", "val") == [(3, "z"), (14, "w")]

    tight = asof_join(
        fleft, right, on="k", left_time="t", right_time="rt",
        direction="forward", tolerance=1,
    )
    assert _rows(tight, "t", "val") == [(3, None), (14, None)]


def _brute_overlap(lrows, rrows, keyed=True):
    out = set()
    for li, lk, ls, le in lrows:
        for ri, rk, rs, re_ in rrows:
            if keyed and lk != rk:
                continue
            if ls <= re_ and rs <= le:
                out.add((li, ri))
    return out


def test_interval_overlap_matches_brute_force(spark):
    """Brute-force parity over adversarial spans: negatives straddling
    bucket 0, touching endpoints, containment, zero-length, widths 1
    and 7 — and every pair appears EXACTLY once (dedupe by
    construction, no distinct)."""
    from capelinker_spark.operators.temporal import interval_overlap_join

    lrows = [
        (1, "a", -10, -3),
        (2, "a", -3, 4),     # touches 1 at -3
        (3, "a", 5, 5),      # zero-length
        (4, "b", 0, 100),    # long span, contains
        (5, "b", 40, 42),
        (6, "b", 101, 103),  # adjacent, no overlap
    ]
    rrows = [
        (10, "a", -5, -4),
        (11, "a", 4, 6),
        (12, "b", 42, 200),
        (13, "b", -7, 0),    # touches 4 at 0
        (14, "c", 0, 50),    # key never matches
    ]
    l = spark.createDataFrame(lrows, "lid long, k string, s long, e long")
    r = spark.createDataFrame(rrows, "rid long, k string, s long, e long")
    want = _brute_overlap(lrows, rrows)
    for w in (1, 7, 1024):
        rows = interval_overlap_join(
            l, r, ("s", "e"), ("s", "e"), on="k", bucket_width=w
        ).collect()
        got = [(x["lid"], x["rid"]) for x in rows]
        assert sorted(got) == sorted(want), f"width {w}"
        assert len(got) == len(set(got)), f"duplicates at width {w}"


def test_interval_overlap_keyless_and_plan(spark):
    from capelinker_spark.operators.temporal import interval_overlap_join

    lrows = [(i, "x", i * 3, i * 3 + 4) for i in range(30)]
    rrows = [(100 + i, "y", i * 5, i * 5 + 2) for i in range(20)]
    l = spark.createDataFrame(lrows, "lid long, tag string, s long, e long")
    r = spark.createDataFrame(rrows, "rid long, tag string, s long, e long")
    out = interval_overlap_join(l, r, ("s", "e"), ("s", "e"), bucket_width=6)
    got = {(x["lid"], x["rid"]) for x in out.collect()}
    want = _brute_overlap(
        [(a, None, c, d) for a, _, c, d in lrows],
        [(a, None, c, d) for a, _, c, d in rrows],
        keyed=False,
    )
    assert got == want
    # suffixed clashing payload columns survive
    assert "tag" in out.columns and "tag_r" in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "EvalPython" not in plan

    # NULL bounds and inverted spans never match
    badl = spark.createDataFrame(
        [(1, None, 5), (2, 9, 3)], "lid long, s long, e long"
    )
    assert (
        interval_overlap_join(
            badl, r.select("rid", "s", "e"), ("s", "e"), ("s", "e")
        ).count()
        == 0
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        interval_overlap_join(l, r, ("s", "e"), ("s", "e"), bucket_width=0)


def test_asof_null_times_never_match(spark):
    """NULL-time right rows are no-match payload donors, and NULL-time
    left rows have no as-of point — both must yield NULL payload
    (DuckDB ASOF semantics: NULL comparison = no match), in BOTH
    directions (review r6: the window sort parked NULL-time rows where
    they leaked payload)."""
    from capelinker_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 5), ("u", None)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("u", None, 100), ("u", 10, 101), ("u", 3, 102)],
        "k string, pts long, pid long",
    )
    back = {
        (r["ts"]): r["pid"]
        for r in asof_join(
            left, right, "k", "ts", "pts", tiebreak="pid"
        ).collect()
    }
    assert back[5] == 102      # latest pts <= 5 is 3
    assert back[None] is None  # NULL left time: no match

    fwd = {
        (r["ts"]): r["pid"]
        for r in asof_join(
            left, right, "k", "ts", "pts", tiebreak="pid",
            direction="forward",
        ).collect()
    }
    assert fwd[5] == 101       # earliest pts >= 5 is 10
    assert fwd[None] is None

    # only a NULL-time right row in range: still no match
    r2 = spark.createDataFrame([("u", None, 100)], "k string, pts long, pid long")
    row = asof_join(left, r2, "k", "ts", "pts", tiebreak="pid").collect()
    assert all(x["pid"] is None for x in row)


def test_interval_overlap_beyond_double_precision(spark):
    """Bucket ids use exact integral division — epoch-nanosecond
    coordinates (> 2^53, where double floor-div mis-buckets) must still
    pair (review r6)."""
    from capelinker_spark.operators.temporal import interval_overlap_join

    base = (1 << 61) + 12345  # far beyond double's 2^53 integer range
    l = spark.createDataFrame(
        [(1, base, base + 10)], "lid long, s long, e long"
    )
    r = spark.createDataFrame(
        [(9, base + 5, base + 20)], "rid long, s long, e long"
    )
    got = interval_overlap_join(
        l, r, ("s", "e"), ("s", "e"), bucket_width=7
    ).collect()
    assert [(x["lid"], x["rid"]) for x in got] == [(1, 9)]


def test_scd2_intervals_semantics(spark):
    """Change-detection SCD-2 build: same-ts dedupe to the greatest
    attrs tuple, heartbeat collapse, NULL-safe change detection, closed
    valid_to = next change - 1, open current version."""
    from capelinker_spark.operators.temporal import scd2_intervals

    rows = [
        # id 1: v=a @1 (dup loads, greatest wins), heartbeat @3, change @5,
        # NULL attr @7, NULL heartbeat @8, back to a @9
        (1, 1, "a"), (1, 1, "A"), (1, 3, "a"), (1, 5, "b"),
        (1, 7, None), (1, 8, None), (1, 9, "a"),
        # id 2: single observation
        (2, 4, "z"),
    ]
    df = spark.createDataFrame(rows, "id long, ts long, v string")
    got = sorted(
        (r["id"], r["valid_from"], r["valid_to"], r["v"])
        for r in scd2_intervals(df, "id", "ts", ["v"]).collect()
    )
    assert got == [
        (1, 1, 4, "a"),      # 'a' > 'A' lexicographically -> winner 'a'
        (1, 5, 6, "b"),
        (1, 7, 8, None),
        (1, 9, None, "a"),
        (2, 4, None, "z"),
    ]
    # current_to pins the open end
    cur = {
        (r["id"], r["valid_from"]): r["valid_to"]
        for r in scd2_intervals(
            df, "id", "ts", ["v"], current_to=999
        ).collect()
    }
    assert cur[(1, 9)] == 999 and cur[(2, 4)] == 999


def test_scd2_single_shuffle_plan(spark):
    """The dedupe lag + change lag + close lead all ride ONE
    hashpartitioning(id) exchange; zero Python."""
    from capelinker_spark.operators.temporal import scd2_intervals

    df = spark.createDataFrame(
        [(i % 5, i, f"v{i % 3}") for i in range(100)],
        "id long, ts long, v string",
    )
    plan = (
        scd2_intervals(df, "id", "ts", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "EvalPython" not in plan


def test_point_in_time_join_truth_table(spark):
    from capelinker_spark.operators.temporal import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, 10, 19, "a"),
            (1, 20, 29, "b"),
            (1, 30, None, "c"),
            (2, 5, 9, "x"),
        ],
        "id long, valid_from long, valid_to long, st string",
    )
    facts = spark.createDataFrame(
        [
            (1, 1, 5),      # before first version → NULL
            (2, 1, 10),     # boundary: == valid_from
            (3, 1, 25),     # mid second version
            (4, 1, 1000),   # open current version
            (5, 2, 4),      # before first
            (6, 2, 9),      # boundary: == valid_to
            (7, 2, 50),     # past CLOSED current → nulled by bounds check
            (8, 3, 12),     # key absent from dim
            (9, 1, None),   # NULL fact time → no as-of point
        ],
        "fid long, id long, ts long",
    )
    out = {
        r["fid"]: (r["valid_from"], r["valid_to"], r["st"])
        for r in point_in_time_join(facts, dim, "id", "ts").collect()
    }
    assert out == {
        1: (None, None, None),
        2: (10, 19, "a"),
        3: (20, 29, "b"),
        4: (30, None, "c"),
        5: (None, None, None),
        6: (5, 9, "x"),
        7: (None, None, None),
        8: (None, None, None),
        9: (None, None, None),
    }


def test_point_in_time_join_plan_and_suffix(spark):
    from capelinker_spark.operators.temporal import point_in_time_join

    dim = spark.createDataFrame(
        [(1, 0, None, "a")], "id long, valid_from long, valid_to long, st string"
    )
    facts = spark.createDataFrame([(1, 5, "f")], "id long, ts long, st string")
    out = point_in_time_join(facts, dim, "id", "ts")
    # colliding dim column suffixed, fact column untouched
    assert "st_v" in out.columns and out.columns.count("st") == 1
    # plan read BEFORE collect: a finalized AQE plan string repeats the
    # exchange inside its materialized ResultQueryStage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert [r["st_v"] for r in out.collect()] == ["a"]
    # asof shape preserved: one keyed shuffle, no join node, no Python
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_scd2_merge_refined_timeline(spark):
    """Two histories stitch onto the boundary-refined timeline:
    one-side-only segments carry NULLs for the absent side, gaps
    covered by neither vanish, the open current version yields an
    open final interval, and a key present on only one side works."""
    from pyspark.sql import functions as F

    from capelinker_spark.operators.temporal import scd2_merge

    dim_a = spark.createDataFrame(
        [(1, 0, 4, "x"), (1, 5, None, "y"), (3, 10, 12, "z")],
        "id long, valid_from long, valid_to long, st string",
    )
    dim_b = spark.createDataFrame(
        [(1, 2, 7, "p"), (2, 0, 1, "q")],
        "id long, valid_from long, valid_to long, pri string",
    )
    got = {
        (r["id"], r["valid_from"]): (
            r["valid_to"], r["st_a"], r["pri_b"]
        )
        for r in scd2_merge(dim_a, dim_b, "id").collect()
    }
    want = {
        (1, 0): (1, "x", None),     # A only
        (1, 2): (4, "x", "p"),      # both
        (1, 5): (7, "y", "p"),      # A's new version, B still valid
        (1, 8): (None, "y", None),  # open current, B expired
        (2, 0): (1, None, "q"),     # key only in B
        (3, 10): (12, "z", None),   # key only in A, closed
    }
    assert got == want
    # boundary 13 (= 12+1) starts a covered-by-neither interval: absent
    assert (3, 13) not in got

    plan = (
        scd2_merge(dim_a, dim_b, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
