"""Dedup family: exact, MinHash-LSH, SimHash, n-gram Jaccard — correctness on
the driver's documents table + planted near-duplicates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from capelinker_spark.operators import dedup as D

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Documents plus planted exact and near duplicates (ids offset 10^6)."""
    base = docs.limit(50)
    exact = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    near = base.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail token")).alias("text"),
        "lang", "source", "n_chars",
    )
    return docs.unionByName(exact).unionByName(near).cache()


def test_exact_dedup(spark, docs_with_dups, docs):
    n_base = docs.count()
    deduped = D.dedup_exact(docs_with_dups)
    # every planted exact dup collapses onto its original (min id survives)
    assert deduped.count() == n_base + 50  # near-dups survive exact dedup
    dups = D.exact_duplicates(docs_with_dups).where(
        F.col("doc_id") != F.col("canonical_id")
    )
    assert dups.count() == 50
    assert dups.where(F.col("doc_id") < 1_000_000).count() == 0


def test_minhash_near_duplicates(spark, docs_with_dups):
    pairs = D.minhash_near_duplicates(
        docs_with_dups, threshold=0.5, num_hashes=16, bands=4
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact dups must be found (jaccard 1, all bands agree)
    exact_expected = {(i, i + 1_000_000) for i in range(50)}
    missing = exact_expected - got
    assert not missing, f"missing exact-dup pairs: {sorted(missing)[:5]}"
    # near dups (one extra token) overwhelmingly recovered
    near_found = sum(1 for i in range(50) if (i, i + 2_000_000) in got)
    assert near_found >= 45
    # jaccard column is a true jaccard
    row = pairs.where((F.col("id_a") == 0) & (F.col("id_b") == 1_000_000)).first()
    assert row["jaccard"] == 1.0


def test_simhash_near_duplicates(spark, docs_with_dups):
    pairs = D.simhash_near_duplicates(docs_with_dups, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    exact_found = sum(1 for i in range(50) if got.get((i, i + 1_000_000)) == 0)
    assert exact_found == 50
    near_found = sum(1 for i in range(50) if (i, i + 2_000_000) in got)
    assert near_found >= 40


def test_ngram_jaccard_expr(spark):
    df = spark.createDataFrame(
        [("abcd", "abcd"), ("abcd", "bcde"), ("abcd", "zzzz")], "a string, b string"
    )
    out = df.select(
        D.ngram_jaccard(
            D.char_ngrams(F.col("a"), 2), D.char_ngrams(F.col("b"), 2)
        ).alias("j")
    ).collect()
    assert out[0]["j"] == 1.0
    # bigrams abcd: {ab,bc,cd}; bcde: {bc,cd,de} → 2/4
    assert out[1]["j"] == pytest.approx(0.5)
    assert out[2]["j"] == 0.0


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    got = df.select(D.word_shingles(F.col("t"), 3).alias("s")).collect()
    assert got[0]["s"] == ["a b c", "b c d"]
    assert got[1]["s"] == ["a b"]  # shorter than n → whole string


def test_minhash_xxhash64_production_tier(spark, docs_with_dups):
    """hash_fn='xxhash64' (JVM-native signatures, ~10x cheaper, no DuckDB
    twin). Every emitted pair is Jaccard-verified, so both tiers emit only
    TRUE near-dups (subset of brute force); banding recall is probabilistic
    per hash family, so the assertion is precision=1 + high recall for each
    tier, not pair-set equality."""
    from pyspark.sql import functions as F

    from capelinker_spark.operators.dedup import (
        minhash_near_duplicates,
        ngram_jaccard,
        word_shingles,
    )

    sh = docs_with_dups.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("_sh")
    )
    truth = {
        (r["id_a"], r["id_b"])
        for r in (
            sh.alias("a")
            .crossJoin(sh.alias("b"))
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                ngram_jaccard(F.col("a._sh"), F.col("b._sh")).alias("j"),
            )
            .where(F.col("j") >= 0.5)
        ).collect()
    }
    assert len(truth) > 5
    for hash_fn in ("md5", "xxhash64"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_near_duplicates(
                docs_with_dups, threshold=0.5, hash_fn=hash_fn
            ).collect()
        }
        assert pairs <= truth, hash_fn  # verify stage: perfect precision
        assert len(pairs) >= 0.8 * len(truth), (hash_fn, len(pairs), len(truth))


def test_near_duplicate_clusters(spark, docs_with_dups):
    """Planted exact+near duplicates collapse to one canonical id (the min
    of the component); untouched docs stay singletons."""
    from capelinker_spark.operators.dedup import near_duplicate_clusters

    out = near_duplicate_clusters(docs_with_dups, threshold=0.5)
    assert out.count() == docs_with_dups.count()  # every doc retained
    rows = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    # doc i (limit 50) + exact copy (i+1e6) + near copy (i+2e6): the triad
    # collapses onto its min member
    planted = [i for i in rows if i < 1_000_000 and i + 1_000_000 in rows]
    assert len(planted) == 50
    collapsed = sum(
        1 for i in planted
        if rows[i + 1_000_000] == i and rows[i + 2_000_000] == i and rows[i] == i
    )
    assert collapsed >= 0.8 * len(planted)  # banding recall
    # canonical is always the component minimum: no member maps upward
    assert all(c <= d for d, c in rows.items())
    singles = [
        d for d, c in rows.items() if c == d and d not in planted and d < 1_000_000
    ]
    assert len(singles) > 100  # non-planted docs stay themselves


def test_flag_contaminated(spark):
    """Docs sharing any word 8-gram with the contamination set are
    flagged; sub-8-word docs only match on whole-text equality (the
    shingle fallback), and clean docs pass."""
    from capelinker_spark.operators.dedup import flag_contaminated

    bench = "the quick brown fox jumps over the lazy dog"  # 9 words
    rows = [
        (0, "intro words then " + bench + " trailing text here"),  # overlap
        (1, "a completely different document about spark internals and shuffles today"),
        (2, bench),                                          # the benchmark itself
        (3, "short clean doc"),                              # <8 words, no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    contam = spark.createDataFrame([(99, bench)], "doc_id long, text string")
    got = {r["doc_id"]: r["contaminated"]
           for r in flag_contaminated(docs, contam, n=8).collect()}
    assert got == {0: True, 1: False, 2: True, 3: False}


def test_duplicate_span_stats(spark):
    """Hand-computed duplicated-span fractions: a doc sharing a 4-word
    window with another scores the shared distinct-gram fraction; clones
    score 1.0; organic docs 0.0."""
    from capelinker_spark.operators.dedup import duplicate_span_stats

    a = "one two three four five six"        # 3 distinct 4-grams
    b = "zero one two three four seven"      # shares 'one two three four' with a
    rows = [(0, a), (1, b), (2, a), (3, "totally different words again here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_shared"], r["dup_span_ratio"])
           for r in duplicate_span_stats(docs, n=4).collect()}
    # doc 0: grams {one..four, two..five, three..six}; one..four shared
    # with doc 1, ALL shared with clone doc 2 -> 3/3
    assert got[0] == (3, 3, 1.0)
    assert got[2] == (3, 3, 1.0)
    # doc 1: {zero..three, one..four, two..seven}; only one..four shared
    assert got[1][0] == 3 and got[1][1] == 1
    assert abs(got[1][2] - 1 / 3) < 1e-15
    assert got[3] == (3, 0, 0.0)


def test_remove_duplicate_spans(spark):
    """dd9 action tier: every word covered by a shared 4-gram is removed
    from EVERY copy (boilerplate has no canonical owner); docs shorter than
    n words and empty docs pass through; output is whitespace-normalized."""
    from capelinker_spark.operators.dedup import remove_duplicate_spans

    rows = [
        (1, "alpha beta gamma delta unique one tail here"),
        (2, "prefix two alpha beta gamma delta other words"),
        (3, "totally different text with no shared spans at all"),
        (4, ""),
        (5, "short doc"),
        (6, "alpha beta gamma delta"),  # exactly the shared span, whole doc
        (7, None),                      # NULL text ≡ empty (review find 4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
           for r in remove_duplicate_spans(docs, n=4).collect()}
    assert got[1] == ("unique one tail here", 8, 4)
    assert got[2] == ("prefix two other words", 8, 4)
    assert got[3] == ("totally different text with no shared spans at all", 9, 0)
    assert got[4] == ("", 0, 0)
    assert got[5] == ("short doc", 2, 0)      # < n words: untouched
    assert got[6] == ("", 4, 4)               # fully-covered doc -> empty
    assert got[7] == ("", 0, 0)               # NULL text: '' not NULL

    # overlapping shared spans merge their coverage
    rows2 = [
        (1, "a b c d e f g x y z"),
        (2, "a b c d q q q q q q"),   # shares a b c d
        (3, "q q q q d e f g w w"),   # shares d e f g -> doc1 loses a..g
    ]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got2 = {r["doc_id"]: r["clean_text"]
            for r in remove_duplicate_spans(docs2, n=4).collect()}
    assert got2[1] == "x y z"

    # plan shape: no Python, no single-partition exchange
    plan = remove_duplicate_spans(docs, n=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_remove_duplicate_paragraphs(spark):
    """dd10: byte-identical paragraphs in ≥2 docs are removed from every
    copy; doc structure (order, \\n\\n joins) survives; whitespace-only
    paragraphs normalize away; NULL/empty text yields ''."""
    from capelinker_spark.operators.dedup import remove_duplicate_paragraphs

    rows = [
        (1, "unique one\n\nSHARED FOOTER BLOCK\n\nunique tail"),
        (2, "other start\n\nSHARED FOOTER BLOCK"),
        (3, "all original\ncontent here"),   # single \n is NOT a para break
        (4, ""),
        (5, None),
        (6, "a\n\n\n\nb"),                   # blank-run normalizes away
        (7, "SHARED FOOTER BLOCK"),          # doc that IS the boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_removed"])
           for r in remove_duplicate_paragraphs(df).collect()}
    assert got[1] == ("unique one\n\nunique tail", 3, 1)
    assert got[2] == ("other start", 2, 1)
    assert got[3] == ("all original\ncontent here", 1, 0)
    assert got[4] == ("", 0, 0)
    assert got[5] == ("", 0, 0)
    assert got[6] == ("a\n\nb", 2, 0)
    assert got[7] == ("", 1, 1)

    # plan shape: no Python, no single-partition exchange
    plan = remove_duplicate_paragraphs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_remove_contaminated_spans(spark):
    """dd11: words covered by an n-gram from the contamination set are
    removed; everything else survives — the surgical tier above
    flag_contaminated's whole-doc drop."""
    from capelinker_spark.operators.dedup import (
        flag_contaminated,
        remove_contaminated_spans,
    )

    bench = "what is the capital of france"
    docs = spark.createDataFrame(
        [
            (1, f"intro words {bench} outro words here"),
            (2, "completely unrelated document with other content"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    contam = spark.createDataFrame([(bench,)], "text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in remove_contaminated_spans(docs, contam, n=6).collect()}
    assert got[1] == ("intro words outro words here", 6)
    assert got[2][1] == 0
    assert got[3] == ("", 0)

    # consistency with the flag tier: a doc losing words is a doc dd7
    # would have flagged
    flags = {r["doc_id"]: r["contaminated"]
             for r in flag_contaminated(docs.where(F.col("text").isNotNull()),
                                        contam, n=6).collect()}
    assert flags[1] is True and flags[2] is False

    # the contamination set broadcasts: corpus grams never shuffle on the
    # gram key
    plan = remove_contaminated_spans(docs, contam, n=6)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_dedup_lines_global_keep_first(spark):
    """C4-style corpus-global line dedup: every duplicate line keeps
    exactly its minimal-(doc, position) occurrence — including repeats
    WITHIN one doc; whitespace-only lines normalize away; NULL ≡ empty;
    the two window aggregates stack on ONE exchange (no second line-key
    shuffle), zero Python."""
    import re

    from capelinker_spark.operators.dedup import dedup_lines_global

    docs = spark.createDataFrame(
        [
            (1, "alpha unique one\nshared footer line\nbeta unique"),
            (2, "shared footer line\ngamma unique two\nshared footer line"),
            (3, None),
            (4, "   \nshared footer line\ndelta"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in dedup_lines_global(docs).collect()}
    assert got == {
        1: ("alpha unique one\nshared footer line\nbeta unique", 3, 0),
        2: ("gamma unique two", 3, 2),        # both copies lose (doc 1 owns)
        3: ("", 0, 0),
        4: ("delta", 2, 1),
    }

    plan = dedup_lines_global(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # exactly one exchange keyed on the line value feeds both windows
    line_exchanges = re.findall(r"Exchange hashpartitioning\(_l#", plan)
    assert len(line_exchanges) == 1, plan.count("Exchange")
