"""Temporal linkage operators: as-of join.

Historical record linkage is temporal at its core — the reference links
person records ACROSS census years (R/candidates.R pairs a `_from` file
with a `_to` file of a later year), and a web-scale corpus carries a crawl
timestamp per page (`warc_ts`): "which was the latest observation of this
key at or before time t?" is the as-of join.

Spark has no native ASOF JOIN (DuckDB does, which is the oracle). The
scalable formulation here is the classic union-tag-window pass:

    1. tag right rows 0 and left rows 1, align both time columns;
    2. ONE window per key ordered by (time, tag, right-tiebreak) with
       `last(right_payload, ignorenulls=True)` over the unbounded-
       preceding frame — each left row picks up the latest right row at
       or before its time;
    3. keep the left rows.

Cost: ONE shuffle of |L|+|R| rows on the join key — no join explosion,
no per-key collect, no range blow-up. Skewed keys degrade to a single
partition's sort (same as any keyed window); at 100 TB the key is
usually high-cardinality (user, entity, url-host) so the hash partition
spreads. This beats the join-then-filter-then-argmax form, which
materializes every (left, right-earlier) pair first.

Duplicate right rows at the same (key, time) are resolved
deterministically by ``tiebreak`` (highest wins), so results are stable
under any partitioning — required for the bit-exact oracle contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "interval_overlap_join",
    "scd2_intervals",
    "point_in_time_join",
    "scd2_merge",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    tiebreak: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """As-of join: for every left row, attach the right row with the
    greatest ``right_time`` ≤ ``left_time`` (``direction='backward'``,
    the default — DuckDB ``ASOF LEFT JOIN ... ON l.t >= r.t`` semantics)
    or the smallest ``right_time`` ≥ ``left_time`` (``'forward'``)
    within the same ``on`` key; rows with no such right row keep NULL
    payload. Ties (equal times) are inclusive in both directions.

    ``tolerance`` (pandas ``merge_asof`` semantics): maximum allowed
    |left_time − right_time|; a match farther away is nulled out. Times
    must be NUMERIC when a tolerance is given (cast timestamps to
    ``unix_micros`` first) — timestamp-interval arithmetic is not
    portable across engines.

    ``tiebreak``: a right column ordering duplicates at the same
    (key, time) — the row with the HIGHEST tiebreak value wins. Defaults
    to ``right_time`` (i.e. unspecified among exact duplicates, so pass
    an id column whenever the right side can carry same-timestamp rows).

    Right payload columns are all non-key, non-time right columns,
    suffixed when they collide with a left name. The forward direction
    is the same one-shuffle window plan with the sort reversed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    tiebreak = tiebreak or right_time

    payload = [c for c in right.columns if c not in keys]
    out_names = {
        c: (c + suffix) if c in left.columns else c for c in payload
    }

    # one struct so a single last() carries the whole right row; the
    # matched right TIME rides inside it (field __rt) for the tolerance
    # check — ordering is done by the window sort below, not by struct
    # comparison
    # NULL-time right rows can never be "the latest observation at or
    # before t" (DuckDB ASOF: a NULL comparison is no match) — but under
    # the window's asc_nulls_first sort they would precede every row and
    # leak their payload into left rows with no true match. Drop them.
    r = right.where(F.col(right_time).isNotNull()).select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(out_names[c]) for c in payload],
        ).alias("_payload"),
    )
    l = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = r.withColumn(
        "_lrow", F.lit(None).cast(l.schema["_lrow"].dataType)
    )

    # right rows sort BEFORE left rows at equal time (ties are inclusive:
    # right_time == left_time matches), and among right duplicates the
    # highest tiebreak sorts last => last() picks it. Forward direction:
    # same frame over the REVERSED time order, so "last seen" is the
    # smallest right_time ≥ left_time.
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = l.unionByName(r).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    # a NULL-time LEFT row has no defined "as of" point (NULL comparison
    # = no match on both engines); without this guard the sort parks it
    # where it can see right rows (first under asc, last under desc)
    match = F.when(F.col("_t").isNotNull(), F.col("_match"))
    if tolerance is not None:
        gap = (
            F.col("_t") - match["__rt"]
            if direction == "backward"
            else match["__rt"] - F.col("_t")
        )
        match = F.when(
            F.col("_t").isNotNull() & (gap <= F.lit(tolerance)),
            F.col("_match"),
        )
    out = tagged.where(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[
            match[out_names[c]].alias(out_names[c])
            for c in payload
        ],
    )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple,
    right_span: tuple,
    on: str | list[str] | None = None,
    bucket_width: int = 1024,
    suffix: str = "_r",
) -> DataFrame:
    """Interval overlap join: every (left, right) pair whose closed
    integer intervals ``[l_start, l_end]`` × ``[r_start, r_end]``
    overlap — ``l_start ≤ r_end AND r_start ≤ l_end`` — optionally
    within equal ``on`` keys. The temporal companion to ``asof_join``:
    validity-window joins (SCD-2 dimensions), crawl-window overlap,
    census-era containment — any "were these two records alive at the
    same time?" question.

    Spark's own planner turns an inequality-only join into
    BroadcastNestedLoopJoin (fine only when one side broadcasts); this
    is the scalable equi-join formulation (the standard range-bucketing
    rewrite): each interval explodes into the width-``bucket_width``
    buckets it covers, the join runs as ONE equi-join on
    (key, bucket), and the true overlap predicate filters exactly.
    Duplicate pair elimination is FREE — a pair is kept only in the
    single bucket containing ``greatest(l_start, r_start)`` (the
    overlap's left edge), so no ``distinct`` shuffle is ever needed.

    ``bucket_width`` trades fan-out for selectivity: each row emits
    span_length/width + 1 bucket rows, and a bucket gathers everything
    alive in its window — pick a width near the TYPICAL interval length
    (the classic range-join-hint heuristic). Skew: a very long interval
    fans out linearly; cap span lengths upstream or raise the width.

    Bounds must be integers (cast dates to epoch days / timestamps to
    unix seconds first); bucket indices use exact integer floor
    division (sign-safe via pmod), so negative coordinates are fine.
    NULL bounds or NULL keys never match (SQL join semantics). Output:
    all left columns + right columns (clashes suffixed), one row per
    overlapping pair — EXACT, no tolerance knobs.
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    keys = [on] if isinstance(on, str) else list(on or [])
    ls, le = left_span
    rs, re_ = right_span

    def fdiv(c: Column) -> Column:
        # exact floor division for LONG coordinates of either sign and
        # any magnitude: c − pmod(c, w) is the exact floor multiple, and
        # integral `div` of an exact multiple is the true quotient —
        # float division here would mis-bucket coordinates beyond 2^53
        # (epoch nanoseconds)
        return F.call_function(
            "div", c - F.pmod(c, F.lit(bucket_width)), F.lit(bucket_width)
        )

    def buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        sc, ec = F.col(s).cast("long"), F.col(e).cast("long")
        return df.where(sc.isNotNull() & ec.isNotNull() & (sc <= ec)).select(
            "*",
            F.explode(F.sequence(fdiv(sc), fdiv(ec))).alias("_bucket"),
        )

    lb = buckets(left, ls, le)
    rb = buckets(right, rs, re_)
    shared = set(left.columns) & set(right.columns)
    for c in right.columns:
        if c in shared and c not in keys:
            rb = rb.withColumnRenamed(c, c + suffix)

    def col_r(name: str) -> Column:
        return F.col(name + suffix if name in shared and name not in keys else name)

    cond = (
        (F.col(ls).cast("long") <= col_r(re_).cast("long"))
        & (col_r(rs).cast("long") <= F.col(le).cast("long"))
        # keep the pair ONLY in the overlap-start bucket: dedupe by
        # construction instead of a distinct shuffle
        & (
            F.col("_bucket")
            == fdiv(
                F.greatest(F.col(ls).cast("long"), col_r(rs).cast("long"))
            )
        )
    )
    out = lb.join(rb, [*keys, "_bucket"]).where(cond).drop("_bucket")
    return out


def scd2_intervals(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    attrs: list[str],
    current_to: int | None = None,
) -> DataFrame:
    """Build SCD-2 (slowly-changing-dimension type 2) validity intervals
    from an attribute change log — the producer whose output feeds
    ``interval_overlap_join`` / ``asof_join``: one row per (entity,
    version) with ``valid_from`` / ``valid_to`` and the version's
    attribute values.

    Semantics (warehouse-standard):

    * observations at the same (id, ts) collapse to ONE deterministic
      winner — the greatest attrs tuple under (attr₁ DESC NULLS LAST,
      attr₂ DESC NULLS LAST, …) — so duplicate loads can't fork
      history;
    * consecutive observations whose ``attrs`` are ALL unchanged
      (NULL-safe comparison) collapse into the earlier version
      (change detection — a heartbeat re-observation extends no new
      version);
    * ``valid_from`` = the version's first ts; ``valid_to`` = next
      version's ts − 1 (closed interval, integer timestamps — cast
      dates/timestamps to epoch days/seconds first); the current
      version's ``valid_to`` is ``current_to`` (default NULL = open).

    Plan shape: everything runs on ONE hash partitioning by id — the
    same-ts dedupe is a lag() over (ts, attrs-desc) rather than a
    (id, ts) aggregate (which would be a SECOND, differently-keyed
    shuffle), and the later change-detect lag / close-interval lead
    windows reuse both the exchange and (by sort-prefix satisfaction)
    the sort. The whole builder is a single shuffle of the change log.
    Zero Python. Returns ``(id_col, valid_from, valid_to, *attrs)``."""
    if not attrs:
        raise ValueError("attrs must be non-empty")
    ts = F.col(ts_col).cast("long")
    base = df.where(F.col(id_col).isNotNull() & ts.isNotNull()).select(
        F.col(id_col), ts.alias("_ts"), *[F.col(a) for a in attrs]
    )
    w0 = Window.partitionBy(id_col).orderBy(
        F.col("_ts").asc(), *[F.col(a).desc_nulls_last() for a in attrs]
    )
    # first row of each (id, ts) run under the attrs-desc order IS the
    # greatest-attrs winner for that ts
    one = base.withColumn("_pts", F.lag("_ts").over(w0)).where(
        F.col("_pts").isNull() | (F.col("_pts") != F.col("_ts"))
    )
    w = Window.partitionBy(id_col).orderBy("_ts")
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # the first row per id: every lag is NULL; eqNullSafe(NULL) is only
    # true when the attr is itself NULL, so force-keep row_number 1
    first = F.row_number().over(w) == 1
    vers = one.withColumn("_keep", first | changed).where("_keep")
    return vers.select(
        F.col(id_col),
        F.col("_ts").alias("valid_from"),
        F.coalesce(
            F.lead("_ts").over(w) - 1,
            F.lit(current_to).cast("long"),
        ).alias("valid_to"),
        *[F.col(a) for a in attrs],
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    fact_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    suffix: str = "_v",
) -> DataFrame:
    """Point-in-time join: attach to every fact row the SCD-2 dimension
    version (one row per (key, ``valid_from``..``valid_to``) closed
    interval, as produced by :func:`scd2_intervals`) that was valid at
    ``fact_time`` — the standard warehouse "as the world looked then"
    dimension lookup (here: score a crawl event against the host policy
    / entity attributes in force at crawl time, not today's).

    Semantics: version valid at t ⇔ ``valid_from ≤ t`` AND
    (``valid_to`` IS NULL OR ``t ≤ valid_to``). SCD-2 intervals are
    non-overlapping per key, so at most one version matches; facts with
    no covering version (t before the first version, after a CLOSED
    current version, or NULL t) keep NULL version columns. Times are
    integers (cast timestamps first — the :func:`asof_join` rule).

    Plan shape: this is :func:`asof_join` on ``valid_from`` (ONE shuffle
    of |facts|+|dim| on the key, no join node, no interval explosion)
    plus a post-hoc range check nulling out matches past a closed
    ``valid_to`` — NOT an inequality join: any later version has
    ``valid_from > t``, so "latest version at or before t, then bounds-
    check" is exactly interval containment. Beats the generic
    ``interval_overlap_join`` here because SCD-2 non-overlap makes the
    as-of window sufficient.

    Returns all fact columns plus the dim payload columns (suffixed on
    collision with a fact name, like ``asof_join``)."""
    keys = [on] if isinstance(on, str) else list(on)
    for c in (valid_from, valid_to):
        if c not in dim.columns:
            raise ValueError(f"dim is missing SCD-2 column {c!r}")
    j = asof_join(
        facts,
        dim,
        on=keys,
        left_time=fact_time,
        right_time=valid_from,
        tiebreak=valid_from,
        suffix=suffix,
    )
    payload = [c for c in dim.columns if c not in keys]
    # derive output names from the JOINED frame (asof_join appends its
    # payload after the left columns, in payload order) instead of
    # re-implementing its collision/suffix rule here
    fact_names = set(facts.columns)
    out = dict(
        zip(payload, [c for c in j.columns if c not in fact_names])
    )
    vt = F.col(out[valid_to])
    in_range = vt.isNull() | (F.col(fact_time).cast("long") <= vt)
    return j.select(
        *[F.col(c) for c in facts.columns],
        *[
            F.when(in_range, F.col(out[c])).alias(out[c])
            for c in payload
        ],
    )


def scd2_merge(
    a: DataFrame,
    b: DataFrame,
    on: str | list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Align two SCD-2 histories of the same entities onto ONE refined
    timeline — per key, the minimal set of intervals on which BOTH
    sides' attributes are constant, each interval carrying side A's and
    side B's version attributes (NULL where a side has no coverage).
    The warehouse "timeline stitching" op: combine a host's crawl
    policy history with its ownership history into one
    attribute-complete chronology, temporal-join two entity attribute
    logs, or diff two independently-maintained dimensions.

    Semantics: closed integer intervals (the :func:`scd2_intervals`
    contract, NULL ``valid_to`` = open current version). Output
    intervals are [boundary, next boundary − 1] over the per-key union
    of both sides' ``valid_from`` and ``valid_to + 1`` points — every
    attribute change on either side starts a new output interval, and
    no output interval straddles a change. Intervals covered by
    NEITHER side (gaps before/after/between coverage) are dropped; the
    final interval is open (NULL) iff some side is open there. Output
    attribute columns are suffixed per side; ``valid_from`` /
    ``valid_to`` name the refined interval.

    Plan shape (Spark-first — NO inequality join): one distinct over
    the boundary union, one per-key lead window, then TWO
    :func:`point_in_time_join` lookups (each the asof union-tag-window
    — one keyed shuffle, no join node, no interval explosion). Every
    exchange hashes the same entity key. The oracle mirror uses
    DuckDB's generic inequality joins — an independent implementation,
    not a transcription.

    Within an output interval the version valid at its START is valid
    THROUGHOUT: a version ending at e puts boundary e+1 in the set, so
    e+1 > start implies e ≥ end for every candidate interval."""
    keys = [on] if isinstance(on, str) else list(on)
    sa, sb = suffixes
    if sa == sb:
        raise ValueError("suffixes must differ")

    def prep(df: DataFrame, sfx: str):
        attrs = [
            c for c in df.columns
            if c not in keys and c not in (valid_from, valid_to)
        ]
        ren = df.select(
            *keys,
            F.col(valid_from).alias(f"_vf{sfx}"),
            F.col(valid_to).alias(f"_vt{sfx}"),
            *[F.col(c).alias(f"{c}{sfx}") for c in attrs],
        )
        return ren, [f"{c}{sfx}" for c in attrs]

    ra, attrs_a = prep(a, sa)
    rb, attrs_b = prep(b, sb)

    def bounds_of(df: DataFrame) -> DataFrame:
        lo = df.select(*keys, F.col(valid_from).alias("_p"))
        hi = df.where(F.col(valid_to).isNotNull()).select(
            *keys, (F.col(valid_to) + F.lit(1)).alias("_p")
        )
        return lo.unionAll(hi)

    bounds = bounds_of(a).unionAll(bounds_of(b)).distinct()
    w = Window.partitionBy(*keys).orderBy(F.col("_p"))
    cand = bounds.select(
        *keys,
        F.col("_p"),
        (F.lead("_p").over(w) - F.lit(1)).alias("_q"),
    )
    j = point_in_time_join(
        cand, ra, on, "_p",
        valid_from=f"_vf{sa}", valid_to=f"_vt{sa}",
    )
    j = point_in_time_join(
        j, rb, on, "_p",
        valid_from=f"_vf{sb}", valid_to=f"_vt{sb}",
    )
    covered = (
        F.col(f"_vf{sa}").isNotNull() | F.col(f"_vf{sb}").isNotNull()
    )
    return j.where(covered).select(
        *keys,
        F.col("_p").alias(valid_from),
        F.col("_q").alias(valid_to),
        *attrs_a,
        *attrs_b,
    )
