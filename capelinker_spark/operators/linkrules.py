"""Deterministic multi-pass linkage cascade.

The probabilistic side of the engine (ml/logistic, ml/fellegi_sunter,
operators/predict) scores candidate pairs; this module is the OTHER
classic historical-linkage recipe (Abramitzky–Boustan–Eriksson census
linking; also the reference's exact-key merge step, R/candidates.R
`merge` on blocking variables): a CASCADE of deterministic rules, from
strictest to loosest, where each pass

    1. equi-joins the records still unmatched on the pass's key columns,
    2. keeps only UNAMBIGUOUS pairs — the left record has exactly one
       candidate in this pass and so does the right record (ambiguous
       records fall through to the next, looser pass, or stay unlinked —
       the conservative choice that keeps deterministic precision high),
    3. removes the matched records from both pools.

Scale shape: each pass is one equi-join on its key (blocking keys are
the join keys, so skew mirrors blocking skew — derive keys with the same
discipline as operators/blocking), two hash-aggregate ambiguity counts
on prefixes of the pair key, and two anti-joins to shrink the pools.
Pass count is small and static, so the plan is a short unrolled chain —
no iteration, no driver data. NULL key components never match (SQL
equi-join semantics), matching the reference's NA-guarded merges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cascade_link"]


def cascade_link(
    left: DataFrame,
    right: DataFrame,
    passes: list[tuple[str, list[str]]],
    id_left: str = "id_from",
    id_right: str = "id_to",
) -> DataFrame:
    """Run the deterministic cascade and return matched pairs
    ``(id_left, id_right, pass_name)``.

    ``passes``: ordered ``(pass_name, [key_col, ...])`` — strictest
    first. Key columns must exist on BOTH sides (precompute derived keys
    — soundex, year bands — as columns beforehand, so each side's key
    expression is evaluated once, not re-derived per pass).

    Determinism: the unambiguity rule makes each pass's output a pure
    function of the input sets — no ordering, no tie-break needed — so
    the cascade is reproducible under any partitioning."""
    if len({n for n, _ in passes}) != len(passes):
        raise ValueError("duplicate pass names")
    l_pool = left
    r_pool = right
    out: DataFrame | None = None
    for pass_name, keys in passes:
        cand = l_pool.select(id_left, *keys).join(
            r_pool.select(id_right, *keys), list(keys)
        )
        nl = Window.partitionBy(id_left)
        nr = Window.partitionBy(id_right)
        matched = (
            cand.withColumn("_nl", F.count("*").over(nl))
            .withColumn("_nr", F.count("*").over(nr))
            .where((F.col("_nl") == 1) & (F.col("_nr") == 1))
            .select(
                id_left, id_right, F.lit(pass_name).alias("pass_name")
            )
        )
        out = matched if out is None else out.unionByName(matched)
        l_pool = l_pool.join(matched.select(id_left), id_left, "left_anti")
        r_pool = r_pool.join(matched.select(id_right), id_right, "left_anti")
    assert out is not None, "passes must be non-empty"
    return out
