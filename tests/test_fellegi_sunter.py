"""Fellegi-Sunter EM: pattern-histogram correctness, parameter recovery
on an analytically-generated corpus, native scoring expression parity with
a hand computation, and degenerate-input guards."""

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from capelinker_spark.ml.fellegi_sunter import (
    FellegiSunterModel,
    comparison_patterns,
    estimate_fellegi_sunter,
)


def _analytic_histogram(spark, m, u, lam, N):
    """Pattern counts proportional to the exact FS mixture likelihood —
    a deterministic 'corpus drawn from the model' without RNG."""
    K = len(m)
    rows = []
    for g in itertools.product([0, 1], repeat=K):
        pm = math.prod(m[k] if g[k] else 1 - m[k] for k in range(K))
        pu = math.prod(u[k] if g[k] else 1 - u[k] for k in range(K))
        n = round(N * (lam * pm + (1 - lam) * pu))
        if n:
            rows.append((*g, n))
    fields = [f"gamma_f{k}" for k in range(K)]
    return spark.createDataFrame(
        rows, ", ".join(f"{f} int" for f in fields) + ", n long"
    )


def test_comparison_patterns_histogram(spark):
    pairs = spark.createDataFrame(
        [
            ("ann", "ann", 30, 30),
            ("ann", "ann", 30, 31),
            ("ann", "bob", 30, 30),
            ("ann", "bob", None, 30),  # NULL agreement -> 0
            ("cat", "cat", 9, 9),
        ],
        "name_l string, name_r string, age_l int, age_r int",
    )
    hist = comparison_patterns(
        pairs,
        {
            "name": F.col("name_l") == F.col("name_r"),
            "age": F.col("age_l") == F.col("age_r"),
        },
    )
    got = {(r["gamma_name"], r["gamma_age"]): r["n"] for r in hist.collect()}
    assert got == {(1, 1): 2, (1, 0): 1, (0, 1): 1, (0, 0): 1}
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "HashAggregate" in plan


def test_em_recovers_known_parameters(spark):
    m_true = [0.95, 0.90, 0.80]
    u_true = [0.20, 0.10, 0.05]
    lam_true = 0.30
    hist = _analytic_histogram(spark, m_true, u_true, lam_true, N=1_000_000)
    model = estimate_fellegi_sunter(
        hist, ["f0", "f1", "f2"], max_iter=500, tol=1e-12
    )
    assert model.converged
    assert model.lam == pytest.approx(lam_true, abs=0.02)
    np.testing.assert_allclose(model.m, m_true, atol=0.02)
    np.testing.assert_allclose(model.u, u_true, atol=0.02)
    # label identifiability: the "match" class is the agreeing one
    assert (model.m > model.u).all()


def test_score_expr_hand_computed(spark):
    model = FellegiSunterModel(
        fields=["a", "b"],
        m=np.array([0.8, 0.5]),
        u=np.array([0.2, 0.25]),
        lam=0.5,
        iterations=1,
        converged=True,
    )
    # weights: a -> (log2 4, log2 .25) = (2, -2); b -> (1, log2(2/3))
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 0)], "gamma_a int, gamma_b int"
    ).withColumn("score", model.score_expr())
    got = {(r["gamma_a"], r["gamma_b"]): r["score"] for r in df.collect()}
    assert got[(1, 1)] == pytest.approx(3.0)
    assert got[(1, 0)] == pytest.approx(2.0 + math.log2(2 / 3))
    assert got[(0, 0)] == pytest.approx(-2.0 + math.log2(2 / 3))

    # P(match | gamma): Bayes check at gamma=(1,1), lam=0.5 -> odds = 2^3
    p = (
        spark.createDataFrame([(1, 1)], "gamma_a int, gamma_b int")
        .withColumn("p", model.match_probability_expr())
        .collect()[0]["p"]
    )
    assert p == pytest.approx(8 / 9)

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_estimate_guards(spark):
    empty = spark.createDataFrame([], "gamma_x int, n long")
    with pytest.raises(ValueError, match="empty pattern histogram"):
        estimate_fellegi_sunter(empty, ["x"])
    trinary = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 5)], "gamma_x int, n long"
    )
    with pytest.raises(ValueError, match="max 2"):
        estimate_fellegi_sunter(trinary, ["x"])


def test_term_frequency_weights_hand_computed(spark):
    """Values john x3 + anna x1: N=4, S2=10. tf(john)=log2(10/12),
    tf(anna)=log2(10/4); the average adjustment over records is ~0 by
    construction (rare values positive, common negative)."""
    import math

    from capelinker_spark.ml.fellegi_sunter import term_frequency_weights

    rec = spark.createDataFrame(
        [("john",), ("john",), ("john",), ("anna",), (None,)],
        "first string",
    )
    got = {
        r["value"]: (r["n_value"], r["tf_weight"])
        for r in term_frequency_weights(rec, "first").collect()
    }
    assert got["john"] == (3, round(math.log2(10 / 12), 6))
    assert got["anna"] == (1, round(math.log2(10 / 4), 6))
    assert set(got) == {"john", "anna"}  # NULLs excluded


def test_term_frequency_weights_uniform_is_zero_ish(spark):
    """All-distinct values: u(v)=1/N for every v and ubar=1/N, so every
    tf weight is exactly log2(1)=0."""
    from capelinker_spark.ml.fellegi_sunter import term_frequency_weights

    rec = spark.range(8).selectExpr("'v' || id AS first")
    ws = term_frequency_weights(rec, "first").collect()
    assert len(ws) == 8
    assert all(r["tf_weight"] == 0.0 for r in ws)


def test_tf_adjust_hand_computed(spark):
    """Agreeing on common 'john' loses weight, disagreeing rows and
    unknown values are untouched; NULL tf join falls back to 0."""
    import math

    from capelinker_spark.ml.fellegi_sunter import (
        term_frequency_weights,
        tf_adjust,
    )

    rec = spark.createDataFrame(
        [("john",)] * 3 + [("anna",)], "first string"
    )
    tf = term_frequency_weights(rec, "first")
    scored = spark.createDataFrame(
        [
            (1, 1, 1.0, "john"),
            (2, 0, 1.0, "john"),
            (3, 1, 0.5, "zed"),
            (4, 1, 2.0, "anna"),
        ],
        "pid long, gamma int, score double, val string",
    )
    out = {
        r["pid"]: r["score"]
        for r in tf_adjust(scored, tf, "val", "gamma", "score").collect()
    }
    w_john = round(math.log2(10 / 12), 6)
    w_anna = round(math.log2(10 / 4), 6)
    assert out[1] == round(1.0 + w_john, 6)
    assert out[2] == 1.0
    assert out[3] == 0.5
    assert out[4] == round(2.0 + w_anna, 6)


def test_tf_adjust_broadcast_plan(spark):
    from capelinker_spark.ml.fellegi_sunter import (
        term_frequency_weights,
        tf_adjust,
    )

    rec = spark.createDataFrame([("a",), ("b",)], "first string")
    tf = term_frequency_weights(rec, "first")
    scored = spark.createDataFrame(
        [(1, 1, 1.0, "a")], "pid long, gamma int, score double, val string"
    )
    plan = tf_adjust(scored, tf, "val", "gamma", "score")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_tf_adjust_composes_with_renamed_out_value(spark):
    """term_frequency_weights(out_value=...) must feed tf_adjust without
    a hardcoded 'value' column (review r6)."""
    from capelinker_spark.ml.fellegi_sunter import (
        term_frequency_weights,
        tf_adjust,
    )

    recs = spark.createDataFrame(
        [(i, "john" if i < 8 else f"rare{i}") for i in range(10)],
        "id long, name string",
    )
    tf = term_frequency_weights(recs, "name", out_value="name_value")
    scored = spark.createDataFrame(
        [(1, "john", 1, 2.0), (2, "rare9", 1, 2.0), (3, "john", 0, 2.0)],
        "pair long, name string, gamma int, score double",
    )
    out = {
        r["pair"]: r["score"]
        for r in tf_adjust(scored, tf, "name", "gamma", "score").collect()
    }
    assert out[2] > out[1]        # rare agreement gains vs common
    assert out[3] == 2.0          # disagreement untouched
