"""BM25 retrieval: hand-computed reference, tier agreement, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from capelinker_spark.operators.ir import bm25_topk, postings, tokens

DOCS = [
    (1, "spark joins tables fast with spark shuffles"),
    (2, "slow scans over big tables and more tables"),
    (3, "spark windows and aggregates run fast today"),
    (4, "completely unrelated words about gardening tools"),
]


def _ref_bm25(query, k1=1.2, b=0.75):
    """Pure-python BM25 over DOCS (Robertson idf)."""
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    scores = {}
    for i, ws in toks.items():
        s = 0.0
        for t in set(query):
            tf = ws.count(t)
            if not tf:
                continue
            df = sum(1 for w in toks.values() if t in w)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (1 + k1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s:
            scores[i] = s
    return scores


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(
        [("q", "spark"), ("q", "fast")], "query_id string, term string"
    )
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, qt, k=10).collect()}
    want = _ref_bm25(["spark", "fast"])
    assert set(got) == set(want)
    for i, v in want.items():
        assert got[i] == pytest.approx(v, rel=1e-9), i
    # doc 1 (two 'spark' hits + short) outranks doc 3 (one of each)
    ranks = {r["doc_id"]: r["rank"]
             for r in bm25_topk(docs, qt, k=10).collect()}
    assert ranks[1] < ranks[3]


def test_bm25_tiers_agree_and_plan_shape(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qt = spark.createDataFrame(
        [("q", "tables"), ("q", "spark")], "query_id string, term string"
    )
    prod = bm25_topk(docs, qt, k=10)
    quant = bm25_topk(docs, qt, k=10, idf_quant=1_000_000)
    p = {(r["query_id"], r["doc_id"], r["rank"]) for r in prod.collect()}
    q = {(r["query_id"], r["doc_id"], r["rank"]) for r in quant.collect()}
    assert p == q                               # same ranking, both tiers
    # quantized scores within 1e-5 of full precision (1e6 quantization)
    ps = {r["doc_id"]: r["score"] for r in prod.collect()}
    qs = {r["doc_id"]: r["score"] for r in quant.collect()}
    assert all(abs(ps[i] - qs[i]) < 1e-5 for i in ps)

    # production tier: zero Python, no cartesian outside the 1-row
    # stats broadcast (BroadcastNestedLoopJoin over a 1-row agg is the
    # lazy-scalar convention, not a data-sized cross join)
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan

    # order-independence of the oracle tier under repartitioning
    quant3 = bm25_topk(docs.repartition(3), qt, k=10, idf_quant=1_000_000)
    assert {(r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in quant3.collect()} == {
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in quant.collect()}


def test_postings_and_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "A a b-b 7seven"), (2, None)], "doc_id long, text string"
    )
    assert docs.select(tokens(F.col("text")).alias("t")).first()["t"] == [
        "a", "a", "b", "b", "7seven"
    ]
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["dl"])
            for r in postings(docs).collect()}
    assert rows == {(1, "a"): (2, 5), (1, "b"): (2, 5), (1, "7seven"): (1, 5)}


def test_rrf_fuse_integer_exact(spark):
    """Fused score is the exact integer sum of 10^12 div (k0+rank);
    docs in one system only still score; ties break by ascending id."""
    from capelinker_spark.operators.ir import rrf_fuse

    lex = spark.createDataFrame(
        [("q1", 100, 1), ("q1", 200, 2), ("q1", 300, 3)],
        "query_id string, doc_id long, rank int",
    )
    den = spark.createDataFrame(
        [("q1", 200, 1), ("q1", 400, 2)],
        "query_id string, doc_id long, rank int",
    )
    out = {
        r["doc_id"]: (r["rrf_micro"], r["n_systems"], r["rank"])
        for r in rrf_fuse([lex, den], k0=60, k=10).collect()
    }
    t = lambda r: 10**12 // (60 + r)
    assert out[200] == (t(2) + t(1), 2, 1)      # both systems -> top
    assert out[100] == (t(1), 1, 2)
    assert out[400] == (t(2), 1, 3)             # t(2) > t(3): plain order
    assert out[300] == (t(3), 1, 4)
    # tie check: craft equal scores, smaller id wins
    a = spark.createDataFrame(
        [("q", 9, 5), ("q", 7, 5)], "query_id string, doc_id long, rank int"
    )
    ranked = {
        r["doc_id"]: r["rank"] for r in rrf_fuse([a], k=10).collect()
    }
    assert ranked[7] == 1 and ranked[9] == 2

    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_bm25f_anchor_boost_and_saturation(spark):
    """A document matched only via its (weighted, b=0) anchor field
    outranks a body-only match of equal body content; combined-then-
    saturated evidence differs from summing two per-field BM25 runs."""
    from capelinker_spark.operators.ir import bm25f_topk

    body = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma delta"),
         (3, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    anchors = spark.createDataFrame(
        [(2, "alpha alpha"), (3, "alpha")],
        "doc_id long, text string",
    )
    qt = spark.createDataFrame([("q", "alpha")], "query_id string, term string")
    out = bm25f_topk(
        [(body, 1.0, 0.75), (anchors, 2.0, 0.0)], qt, k=10,
        idf_quant=1_000_000,
    )
    rows = {r.doc_id: (r.rank, r.score) for r in out.collect()}
    # doc 2 = body hit + double anchor hit -> rank 1; doc 1 body-only
    assert rows[2][0] == 1
    assert rows[2][1] > rows[1][1]
    # doc 3 matches ONLY through its anchor field yet still ranks
    assert 3 in rows and rows[3][1] > 0

    with __import__("pytest").raises(ValueError, match="at least one"):
        bm25f_topk([], qt)


def test_bm25f_empty_field_rows_absent(spark):
    """Docs absent from a field simply contribute nothing from it."""
    from capelinker_spark.operators.ir import bm25f_topk

    body = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha")], "doc_id long, text string"
    )
    anchors = spark.createDataFrame([(2, "alpha")], "doc_id long, text string")
    qt = spark.createDataFrame([("q", "alpha")], "query_id string, term string")
    out = bm25f_topk(
        [(body, 1.0, 0.75), (anchors, 1.0, 0.0)], qt, idf_quant=1_000_000
    )
    rows = {r.doc_id: r.score for r in out.collect()}
    assert rows[2] > rows[1] > 0
