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


def test_curate_corpus_composition(spark):
    """The four-stage curation flow end-to-end on a hand-built corpus:
    exact dups collapse, short and low-alpha docs drop, language rates
    apply, survivors pack contiguously in id order."""
    from capelinker_spark.curation import curate_corpus

    good = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, good, "en"),
        (1, good, "en"),                      # exact dup of 0 → dropped
        (2, "too short", "en"),                # < 10 tokens → dropped
        (3, "1 2 3 4 5 6 7 8 9 10 11 12", "en"),  # low alpha → dropped
        (4, good + " with more words", "de"),
        (5, good + " and a different tail here", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = curate_corpus(df, min_tokens=10, min_alpha_ratio=0.5,
                        lang_rates=None, tokens_per_seq=16)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {0, 4, 5}  # dup/short/low-alpha all gone
    # packing: contiguous offsets in doc_id order
    off = 0
    for i in sorted(got):
        assert got[i]["seq_offset"] == off
        assert got[i]["seq_id"] == off // 16
        off += got[i]["n_tokens"]
    # language mixing drops deterministically when rates are set
    n_en_full = sum(1 for i in got if got[i]["lang"] == "en")
    out2 = curate_corpus(df, min_tokens=10, min_alpha_ratio=0.5,
                         lang_rates={"en": 0.0}, tokens_per_seq=16)
    langs2 = {r["lang"] for r in out2.collect()}
    assert "en" not in langs2 and "de" in langs2 and n_en_full == 1


def test_null_counts_pack_as_zero(spark):
    """Round-4 fix: NULL count_col no longer propagates NULL into
    _start/seq_id or shifts later offsets (SUM skips NULLs) — a NULL-count
    doc occupies zero tokens at its position and every offset matches the
    same frame with the NULL replaced by literal 0."""
    from pyspark.sql import functions as F

    from capelinker_spark.operators.packing import assign_packed_sequences

    rows = [(0, 60), (1, None), (2, 50), (3, 40), (4, None), (5, 70)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: (r["seq_offset"], r["seq_id"])
        for r in assign_packed_sequences(df, "n", "doc_id", 128).collect()
    }
    want_df = df.withColumn("n", F.coalesce("n", F.lit(0)))
    want = {
        r["doc_id"]: (r["seq_offset"], r["seq_id"])
        for r in assign_packed_sequences(want_df, "n", "doc_id", 128).collect()
    }
    assert got == want
    assert got[1] == (60, 0) and got[4] == (150, 1)
    assert got[5] == (150, 1)


def test_curate_corpus_injected_token_counter(spark):
    """The token_counter seam: BPE-ish counts change BOTH the min_tokens
    gate and the packing budget. 'a-b c-d e-f g-h i-j' is 5 ws tokens
    (fails min_tokens=10 under ws) but 15 BPE-ish tokens (passes); offsets
    accumulate in the chosen unit."""
    from pyspark.sql import functions as F

    from capelinker_spark.curation import curate_corpus
    from capelinker_spark.operators.textstats import token_count_bpe

    hyphens = "a-b c-d e-f g-h i-j"          # 5 ws / 15 bpe tokens
    plain = "one two three four five six seven eight nine ten"  # 10 ws / 10 bpe
    df = spark.createDataFrame(
        [(0, hyphens, "en"), (1, plain, "en")], "doc_id long, text string, lang string"
    )
    ws = curate_corpus(df, min_tokens=10, min_alpha_ratio=0.5,
                       lang_rates=None, tokens_per_seq=16)
    assert {r["doc_id"] for r in ws.collect()} == {1}
    bpe = curate_corpus(df, min_tokens=10, min_alpha_ratio=0.5,
                        lang_rates=None, tokens_per_seq=16,
                        token_counter=token_count_bpe)
    got = {r["doc_id"]: (r["n_tokens"], r["seq_offset"], r["seq_id"])
           for r in bpe.collect()}
    assert got == {0: (15, 0, 0), 1: (10, 15, 0)}
