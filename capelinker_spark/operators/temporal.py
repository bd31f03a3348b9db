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

__all__ = ["asof_join"]


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
    r = right.select(
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
    match = F.col("_match")
    if tolerance is not None:
        gap = (
            F.col("_t") - match["__rt"]
            if direction == "backward"
            else match["__rt"] - F.col("_t")
        )
        match = F.when(gap <= F.lit(tolerance), F.col("_match"))
    out = tagged.where(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[
            match[out_names[c]].alias(out_names[c])
            for c in payload
        ],
    )
    return out
