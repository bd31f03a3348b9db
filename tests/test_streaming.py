"""Structured-Streaming: extractor runs on a stream; windowed ingest stats;
incremental micro-batch linkage equals the batch result."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from capelinker_spark import streaming as ST
from capelinker_spark.fixtures import PAGES_SCHEMA


@pytest.fixture(scope="module")
def pages_dir(spark, pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    pages.write.mode("overwrite").parquet(d)
    return d


def test_stream_extract_matches_batch(spark, pages, pages_dir, tmp_path_factory):
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    out_dir = str(tmp_path_factory.mktemp("records_out"))
    ck = str(tmp_path_factory.mktemp("ck1"))
    q = (
        ST.stream_extract(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    from capelinker_spark.extract import extract_records

    batch = extract_records(pages, with_spousenamedist=False)
    assert got.count() == batch.count()
    g = {r["url"]: r["mlast"] for r in got.select("url", "mlast").collect()}
    b = {r["url"]: r["mlast"] for r in batch.select("url", "mlast").collect()}
    assert g == b


def test_page_ingest_stats_stream(spark, pages_dir, tmp_path_factory):
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    stats = ST.page_ingest_stats(stream, window="60 minutes")
    ck = str(tmp_path_factory.mktemp("ck2"))
    q = (
        stats.writeStream.format("memory")
        .queryName("ingest_stats")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ingest_stats").collect()
    assert sum(r["n_pages"] for r in rows) > 0
    assert all(r["lang"] in ("af", "nl", "en") for r in rows)


def test_dedup_stream(spark, pages, pages_dir, tmp_path_factory):
    """Streaming dedup keeps one row per url even when the source repeats."""
    dup_dir = str(tmp_path_factory.mktemp("pages_dup"))
    pages.limit(100).write.mode("overwrite").parquet(dup_dir)
    pages.limit(100).write.mode("append").parquet(dup_dir)  # duplicates
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(dup_dir)
    out_dir = str(tmp_path_factory.mktemp("dedup_out"))
    ck = str(tmp_path_factory.mktemp("ck_dedup"))
    q = (
        ST.dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == got.select("url").distinct().count() == 100


def test_incremental_link_matches_batch(
    spark, pages, truth, pages_dir, tmp_path_factory
):
    """Micro-batch linkage of 1828 pages against the static 1826 reference
    produces the same accepted links as the equivalent batch plan."""
    from capelinker_spark.extract import extract_records
    from capelinker_spark.ml.logistic import LogisticModel

    import numpy as np

    records = extract_records(pages, with_spousenamedist=False).cache()
    reference = records.where(F.col("year") == 1826).cache()

    # simple fixed-weight scorer (deterministic; no training dependency)
    model = LogisticModel(
        features=["mlastdist", "mfirstdist"],
        weights=np.array([-3.0, -3.0]),
        bias=2.0,
        means=np.array([0.5, 0.5]),
        stds=np.array([1.0, 1.0]),
    )

    # batch reference result
    from capelinker_spark.operators.candidates import candidates_multikey
    from capelinker_spark.operators.features import distcalc
    from capelinker_spark.operators.predict import rank_links, select_links

    new_records = records.where(F.col("year") == 1828)
    keys = [
        lambda df: F.soundex(F.col("mlast")),
        lambda df: F.soundex(F.col("mlast_woprefix")),
        lambda df: F.soundex(F.col("mfirst")),
    ]
    cnd = candidates_multikey(new_records, reference, keys, keep_unmatched="none")
    feats = distcalc(
        cnd, character_variables=("mlast", "mfirst", "wlast", "wfirst"),
        numeric_variables=("year",),
    )
    from capelinker_spark.operators.features import add_wifeinboth

    feats = add_wifeinboth(feats)
    batch_links = {
        (r["persid_from"], r["persid_to"])
        for r in select_links(
            rank_links(model.transform(feats), "persid_from", "persid_to"),
            0.5,
            "many:one",
        )
        .select("persid_from", "persid_to")
        .collect()
    }

    # streaming run over only the 1828 pages
    pages_1828_dir = str(tmp_path_factory.mktemp("pages_1828"))
    pages.where(F.col("url").rlike("/1828/")).write.mode("overwrite").parquet(
        pages_1828_dir
    )
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_1828_dir)
    out_dir = str(tmp_path_factory.mktemp("links_out"))
    ck = str(tmp_path_factory.mktemp("ck3"))
    q = ST.incremental_link(stream, reference, model, ck, out_dir)
    q.awaitTermination(180)
    stream_links = {
        (r["persid_from"], r["persid_to"])
        for r in spark.read.parquet(out_dir).select("persid_from", "persid_to").collect()
    }
    assert stream_links == batch_links
    assert len(stream_links) > 50


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer ≡ batch sessionize, with state
    carried across micro-batches (maxFilesPerTrigger=1 over 3 files)."""
    from datetime import datetime, timedelta

    from capelinker_spark.operators.events import sessionize
    from capelinker_spark.streaming import stream_sessionize

    base = datetime(2024, 3, 1, 8, 0, 0)
    rows = []
    eid = 0
    for u in range(6):
        t = base + timedelta(minutes=7 * u)
        for k in range(12):
            # alternate small gaps and >30-min silences per user
            t = t + timedelta(minutes=5 if k % 3 else 50)
            rows.append((u, eid, t))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    src = str(tmp_path / "events_stream")
    # three time-ordered files → three micro-batches, state must carry over
    ordered = sorted(rows, key=lambda r: r[2])
    for i in range(3):
        chunk = ordered[i * 24 : (i + 1) * 24]
        spark.createDataFrame(
            chunk, "user_id long, event_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: (r["session"], r["session_start"])
        for r in spark.table("sess_stream").collect()
    }
    want = {
        r["event_id"]: (r["session"], r["session_start"])
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == want
    assert len(got) == len(rows)
    assert max(s for s, _ in want.values()) >= 4  # the gap rule split sessions


def test_stream_sessionize_evicted_user_returns(spark, tmp_path):
    """A user whose state was evicted (event-time timeout) and who later
    returns: the stream's session INDEX restarts at 1 (documented), but
    (user, session_start) remains collision-free and matches batch
    sessionize exactly — the round-2 advice fix."""
    from datetime import datetime, timedelta

    from capelinker_spark.operators.events import sessionize
    from capelinker_spark.streaming import stream_sessionize

    base = datetime(2024, 3, 1, 8, 0, 0)
    # file 1: user 0 has a short session; user 1 keeps the stream alive
    f1 = [(0, 1, base), (0, 2, base + timedelta(minutes=5)),
          (1, 3, base + timedelta(minutes=1))]
    # file 2: only user 1, five days later → advances the watermark past
    # user 0's last+gap
    f2 = [(1, 4, base + timedelta(days=5))]
    # file 3: only user 1 again — a batch where user 0 has NO data is when
    # the pending event-time timeout actually fires (timeouts never fire
    # for groups with arrivals in the same batch), evicting user 0's state
    f3 = [(1, 5, base + timedelta(days=5, minutes=1))]
    # file 4: user 0 returns after the eviction
    f4 = [(0, 6, base + timedelta(days=5, minutes=30)),
          (1, 7, base + timedelta(days=5, minutes=31))]
    schema = "user_id long, event_id long, ts timestamp"
    src = str(tmp_path / "events_evict")
    for chunk in (f1, f2, f3, f4):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessionize(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sess_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["event_id"]: r for r in spark.table("sess_evict").collect()}
    df = spark.createDataFrame(f1 + f2 + f3 + f4, schema)
    want = {r["event_id"]: r for r in sessionize(df, gap_minutes=30).collect()}
    assert len(got) == 7
    # the collision-free key matches batch for EVERY event, eviction or not
    for eid in got:
        assert got[eid]["session_start"] == want[eid]["session_start"], eid
    # and the documented index reset actually happened: user 0's second
    # session is index 2 in batch but restarts at 1 in the stream
    assert want[6]["session"] == 2
    assert got[6]["session"] == 1
    # so (user, session_start) is the only safe aggregation key
    stream_keys = {(r["user_id"], r["session_start"]) for r in got.values()}
    batch_keys = {(r["user_id"], r["session_start"]) for r in want.values()}
    assert stream_keys == batch_keys


def test_stream_curate_matches_batch(spark, tmp_path):
    """Streaming curation ≡ the batch flow's streamable stages: the same
    documents survive the quality filter + content dedup whether consumed
    as 3 micro-batches or one batch table (arrival order follows doc_id,
    so the stream's first-arrived dedup representative equals batch's
    min-id one)."""
    from capelinker_spark.curation import curate_corpus
    from capelinker_spark.streaming import stream_curate

    good = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, good + " zero", "en"),
        (1, "too short", "en"),                     # quality-dropped
        (2, good + " two", "de"),
        (3, good + " zero", "en"),                  # exact dup of 0 (same batch file)
        (4, "1 2 3 4 5 6 7 8 9 10 11 12 13", "en"),  # low alpha
        (5, good + " five", "en"),
        (6, good + " two", "de"),                   # dup of 2 ACROSS batches
        (7, good + " seven", "fr"),
    ]
    schema = "doc_id long, text string, lang string"
    src = str(tmp_path / "docs_stream")
    for lo, hi in ((0, 3), (3, 6), (6, 8)):
        spark.createDataFrame(rows[lo:hi], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_curate(stream, min_tokens=10, min_alpha_ratio=0.5,
                      watermark_col=None)
        .writeStream.format("memory")
        .queryName("curate_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.table("curate_stream").collect()}
    # batch reference: the same streamable stages (dedup+quality; packing
    # is batch-only by nature) — compare the surviving doc set
    batch = curate_corpus(
        spark.createDataFrame(rows, schema),
        min_tokens=10, min_alpha_ratio=0.5, lang_rates=None,
        tokens_per_seq=64,
    )
    want = {r["doc_id"] for r in batch.collect()}
    assert got == want == {0, 2, 5, 7}
    # content set sanity: each surviving hash is unique
    hashes = [r["content_hash"] for r in spark.table("curate_stream").collect()]
    assert len(hashes) == len(set(hashes))


def test_stream_curate_watermarked_bounded_state(spark, tmp_path):
    """Watermarked stream_curate drops duplicates INSIDE the watermark
    horizon and expires state once the watermark passes — the bounded-state
    contract. (Round-4 fix: plain withWatermark(...).dropDuplicates(subset)
    never evicts state when the event-time column isn't in the subset;
    dropDuplicatesWithinWatermark does.) Three micro-batches:

      batch 1: A@00:00, B@00:01
      batch 2: dup-of-A@00:05 (inside the 10-min horizon → dropped) and
               C@02:00 (advances the watermark to 01:50)
      batch 3: D@02:02 — runs with watermark 01:50, so A/B state (expiry
               00:10/00:11) is evicted at this batch's commit
      batch 4: dup-of-A@02:03 — state expired → re-emitted (this is the
               documented horizon semantics, and the proof eviction ran)
    """
    import datetime as dt

    from capelinker_spark.streaming import stream_curate

    good = "the quick brown fox jumps over the lazy dog again and again"

    def t(minute):
        return dt.datetime(2026, 1, 1, minute // 60, minute % 60)

    schema = "doc_id long, text string, lang string, ts timestamp"
    batches = [
        [(0, good + " alpha", "en", t(0)), (1, good + " beta", "en", t(1))],
        [(2, good + " alpha", "en", t(5)), (3, good + " gamma", "en", t(120))],
        [(4, good + " delta", "en", t(122))],
        [(5, good + " alpha", "en", t(123))],
    ]
    src = str(tmp_path / "docs_wm_stream")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_curate(stream, min_tokens=10, min_alpha_ratio=0.5,
                      watermark_col="ts", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("curate_wm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table("curate_wm_stream").collect()}
    # 0,1,3,4 survive; 2 is a within-horizon duplicate of 0; 5 re-emits
    # after the watermark expired doc 0's state (bounded state, by design)
    assert got == {0, 1, 3, 4, 5}


def test_sample_to_rates_composes_with_streams(spark, tmp_path):
    """The mixing rules are pure narrow filters, so they run unchanged on a
    streaming DataFrame (the composition stream_curate's docstring points
    at): stream-side sample_to_rates keeps EXACTLY the rows the identical
    batch filter keeps — deterministic hash rule, no state, no watermark."""
    from capelinker_spark.operators.mixing import sample_to_rates

    rows = [(i, "en" if i % 3 else "de") for i in range(300)]
    schema = "doc_id long, lang string"
    src = str(tmp_path / "mix_stream")
    spark.createDataFrame(rows, schema).coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sample_to_rates(stream, "lang", {"en": 0.3, "de": 0.8}, "doc_id")
        .writeStream.format("memory")
        .queryName("mix_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table("mix_stream_out").collect()}
    batch = sample_to_rates(
        spark.createDataFrame(rows, schema), "lang", {"en": 0.3, "de": 0.8},
        "doc_id",
    )
    want = {r["doc_id"] for r in batch.collect()}
    assert got == want and 0 < len(got) < 300


def test_stream_cluster_links_matches_batch(spark, tmp_path):
    """Incremental CC over the link stream ≡ batch connected components,
    across micro-batches with cross-batch bridging edges (round-4 verdict
    item 7), including a stream RESTART folding a later wave into the
    persisted label table, and version retention in the label store."""
    import os

    from capelinker_spark.operators.cluster import connected_components
    from capelinker_spark.streaming import (
        read_component_labels,
        stream_cluster_links,
    )

    batches = [
        [(1, 2), (3, 4), (10, 11)],
        [(2, 3)],                      # bridges {1,2} and {3,4}
        [(20, 21), (4, 20)],           # new nodes AND a bridge into 1's comp
    ]
    src = str(tmp_path / "links_stream")
    for b in batches:
        spark.createDataFrame(
            b, "persid_from long, persid_to long"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        stream = (
            spark.readStream.schema("persid_from long, persid_to long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_cluster_links(
            stream, str(tmp_path / "ckpt"), str(tmp_path / "labels")
        )
        q.awaitTermination()

    def labels():
        return sorted(
            (r["node"], r["component"])
            for r in read_component_labels(
                spark, str(tmp_path / "labels")
            ).collect()
        )

    def batch_cc(edge_lists):
        all_edges = spark.createDataFrame(
            [e for b in edge_lists for e in b],
            "persid_from long, persid_to long",
        )
        return sorted(
            (r["node"], r["component"])
            for r in connected_components(
                all_edges, src="persid_from", dst="persid_to"
            ).collect()
        )

    run_stream()
    assert labels() == batch_cc(batches)

    # restart with a fourth wave: checkpoint + label-store versions resume
    wave4 = [(100, 101), (11, 100)]
    spark.createDataFrame(
        wave4, "persid_from long, persid_to long"
    ).coalesce(1).write.mode("append").parquet(src)
    run_stream()
    assert labels() == batch_cc(batches + [wave4])

    # retention: at most keep_versions=2 label versions remain on disk
    vers = [d for d in os.listdir(str(tmp_path / "labels"))
            if d.startswith("v=")]
    assert len(vers) <= 2

    # lineage (round-5 verdict item 7): one cc_fold row per committed
    # fold with batch-bounded metrics and elapsed time
    import json

    with open(str(tmp_path / "labels" / "_lineage.jsonl")) as fh:
        folds = [json.loads(l) for l in fh if l.strip()]
    assert len(folds) == len(batches) + 1            # 4 committed waves
    for e in folds:
        assert e["stage"] == "cc_fold"
        for k in ("batch_id", "wave_edges", "affected_components",
                  "merged_components", "new_nodes", "row_count",
                  "elapsed_sec"):
            assert k in e, k
    by_batch = {e["batch_id"]: e for e in folds}
    assert by_batch[0]["wave_edges"] == 3 and by_batch[0]["new_nodes"] == 6
    # wave 1 ((2,3)) merges {1,2} with {3,4}: no new nodes, 2 affected
    # components collapse into 1
    assert by_batch[1]["new_nodes"] == 0
    assert by_batch[1]["merged_components"] >= 1
    # final label table covers all 10 nodes
    assert folds[-1]["row_count"] == 10


def test_stream_neardup_canonical_matches_batch(spark, tmp_path):
    """Incremental MinHash-LSH near-dup clustering ≡ batch
    near_duplicate_clusters over the union, across micro-batches with
    cross-batch near-dup pairs in BOTH id orders (a later-arriving doc
    with a smaller id must still pair — regression for the bare
    id_a < id_b candidate cut), plus a stream restart folding a new wave."""
    from capelinker_spark.operators.dedup import near_duplicate_clusters
    from capelinker_spark.streaming import (
        read_component_labels,
        stream_neardup_canonical,
    )

    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet field tonight")
    variant = base + " extra"
    other = ("completely different content about ships and harbours that "
             "shares no shingles with the fox corpus at all here")
    batches = [
        [(10, base), (11, other), (12, "short unrelated words only")],
        # 5 < 10: near-dup of doc 10 arriving LATER with a SMALLER id
        [(5, variant), (20, other + " slightly changed tail")],
        [(30, base + " third copy marker")],
    ]
    src = str(tmp_path / "docs_stream")
    for b in batches:
        spark.createDataFrame(
            b, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

    state = str(tmp_path / "state")

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_neardup_canonical(
            stream, str(tmp_path / "ckpt"), state, threshold=0.5
        )
        q.awaitTermination()

    def stream_canonical(edge_lists):
        labels = {
            r["node"]: r["component"]
            for r in read_component_labels(
                spark, str(tmp_path / "state/labels")
            ).collect()
        }
        all_ids = [i for b in edge_lists for i, _ in b]
        return {i: labels.get(i, i) for i in all_ids}

    def batch_canonical(edge_lists):
        docs = spark.createDataFrame(
            [r for b in edge_lists for r in b], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r["canonical_id"]
            for r in near_duplicate_clusters(docs, threshold=0.5).collect()
        }

    run_stream()
    got, want = stream_canonical(batches), batch_canonical(batches)
    assert got == want
    # the planted family actually clustered (5 joined 10's component)
    assert want[5] == want[10] == want[30] == 5
    assert want[11] == want[20] == 11

    # restart with a fourth wave bridging nothing new + one more variant
    wave4 = [(40, variant + " again"), (41, "lone new document entirely")]
    spark.createDataFrame(
        wave4, "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    run_stream()
    got2 = stream_canonical(batches + [wave4])
    want2 = batch_canonical(batches + [wave4])
    assert got2 == want2
    assert want2[40] == 5 and want2[41] == 41


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """Streaming span-level decontamination ≡ batch
    remove_contaminated_spans over the union, across 3 micro-batches
    (maxFilesPerTrigger=1): clean_text byte-equal per doc, contaminated
    spans removed, unrelated text untouched; a restart replays
    idempotently (overwrite-per-batch sink)."""
    from capelinker_spark.operators.dedup import remove_contaminated_spans
    from capelinker_spark.streaming import stream_decontaminate

    eval_snippet = ("what is the capital of france the capital of france "
                    "is paris of course")
    clean = ("a long rambling essay about gardening tools and the many "
             "ways to sharpen a spade in autumn weather")
    batches = [
        [(1, f"intro words here {eval_snippet} closing remarks after"),
         (2, clean)],
        [(3, clean + " second doc variant tail"),
         (4, f"{eval_snippet} leading quote then original analysis follows "
             "for several more words")],
        [(5, "short doc"), (6, f"padding start {clean} {eval_snippet}")],
    ]
    src = str(tmp_path / "decon_src")
    for b in batches:
        spark.createDataFrame(
            b, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
    contam = spark.createDataFrame([(eval_snippet,)], "text string")

    out = str(tmp_path / "decon_out")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_decontaminate(
            stream, contam, str(tmp_path / "decon_ckpt"), out, n=8
        )
        q.awaitTermination()

    run()
    got = {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
           for r in spark.read.parquet(out).collect()}

    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string"
    )
    want = {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
            for r in remove_contaminated_spans(all_docs, contam, n=8).collect()}
    assert got == want                       # byte-equal, all 6 docs
    assert eval_snippet not in got[1][0] and got[1][2] > 0
    assert got[2] == (clean, len(clean.split()), 0)   # untouched

    # restart over the same source: availableNow has consumed everything,
    # so a rerun is a no-op and the sink is unchanged (idempotence)
    run()
    again = {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
             for r in spark.read.parquet(out).collect()}
    assert again == want


def test_stream_point_in_time_enrich_matches_batch(spark, tmp_path):
    """Streaming point-in-time enrichment ≡ batch point_in_time_join
    over the union, across 3 micro-batches: late-arriving facts attach
    the HISTORICAL version valid at their own timestamp (not the
    current one), uncovered facts keep NULLs, and a restart replays
    idempotently."""
    from capelinker_spark.operators.temporal import point_in_time_join
    from capelinker_spark.streaming import stream_point_in_time_enrich

    # SCD-2 dim: key 1 has versions [0,9] 'old', [10,null) 'new';
    # key 2 has one CLOSED version [5,8] 'only'
    dim = spark.createDataFrame(
        [(1, 0, 9, "old"), (1, 10, None, "new"), (2, 5, 8, "only")],
        "id long, valid_from long, valid_to long, attr string",
    )
    batches = [
        [(100, 1, 12)],                  # current version
        [(101, 1, 3), (102, 2, 9)],      # late fact -> 'old'; past closed
        [(103, 2, 7), (104, 3, 1)],      # covered; unknown key
    ]
    src = str(tmp_path / "pit_src")
    for b in batches:
        spark.createDataFrame(
            b, "fact_id long, id long, ts long"
        ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "pit_out")

    def run():
        stream = (
            spark.readStream.schema("fact_id long, id long, ts long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_point_in_time_enrich(
            stream, dim, str(tmp_path / "pit_ckpt"), out,
            on="id", fact_time="ts",
        )
        q.awaitTermination()

    run()
    cols = ("fact_id", "id", "ts", "valid_from", "valid_to", "attr")
    got = {r["fact_id"]: tuple(r[c] for c in cols)
           for r in spark.read.parquet(out).collect()}
    all_facts = spark.createDataFrame(
        [r for b in batches for r in b], "fact_id long, id long, ts long"
    )
    want = {r["fact_id"]: tuple(r[c] for c in cols)
            for r in point_in_time_join(all_facts, dim, "id", "ts").collect()}
    assert got == want and len(got) == 5
    assert got[100][5] == "new"          # current version attached
    assert got[101][5] == "old"          # late fact -> historical version
    assert got[102][5] is None           # t past the closed version
    assert got[103][5] == "only"
    assert got[104][5] is None           # unknown key

    run()                                # idempotent replay
    again = {r["fact_id"]: tuple(r[c] for c in cols)
             for r in spark.read.parquet(out).collect()}
    assert again == want


def test_stream_url_dedup_matches_batch(spark, tmp_path):
    """Streaming keep-latest URL dedup ≡ batch dedup_urls_keep_latest
    over the union, across micro-batches where the same canonical URL
    recurs in noisy spellings, a LATER batch carries an OLDER snapshot
    (must bump the count without displacing the kept row), and a ts tie
    resolves by min doc_id; plus an idempotent restart wave."""
    from capelinker_spark.operators.urls import dedup_urls_keep_latest
    from capelinker_spark.streaming import (
        read_url_dedup_state,
        stream_url_dedup,
    )

    batches = [
        [
            (1, "HTTP://A.Example.COM:80/p?b=2&a=1#f", 10),
            (2, "https://b.example/q", 40),
        ],
        [
            (3, "http://a.example.com/p?utm_source=x&a=1&b=2", 30),
            (4, "https://b.example/q?utm_medium=m", 40),  # ts tie vs doc 2
        ],
        [
            (5, "http://A.EXAMPLE.com/p?a=1&b=2", 20),  # older than doc 3
            (6, "https://c.example/new", 5),
        ],
    ]
    src = str(tmp_path / "pages_stream")
    schema = "doc_id long, url string, warc_ts long"
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = str(tmp_path / "state")

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_url_dedup(stream, str(tmp_path / "ckpt"), state)
        q.awaitTermination()

    def stream_result():
        return {
            r.canon_url: (r.doc_id, r.warc_ts, r.n_snapshots)
            for r in read_url_dedup_state(spark, state).collect()
        }

    def batch_result(waves):
        df = spark.createDataFrame([r for b in waves for r in b], schema)
        return {
            r.canon_url: (r.doc_id, r.warc_ts, r.n_snapshots)
            for r in dedup_urls_keep_latest(df).collect()
        }

    run_stream()
    got, want = stream_result(), batch_result(batches)
    assert got == want
    # semantics spot-checks: newest wins (doc 3, ts 30, 3 snapshots);
    # tie broken by min doc_id (doc 2, 2 snapshots)
    assert got["http://a.example.com/p?a=1&b=2"] == (3, 30, 3)
    assert got["https://b.example/q"] == (2, 40, 2)
    assert got["https://c.example/new"] == (6, 5, 1)

    # restart: a fourth wave with one newer snapshot + one new resource
    wave4 = [(7, "http://a.example.com/p?a=1&b=2", 99), (8, "https://d.example/x", 1)]
    spark.createDataFrame(wave4, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_stream()
    got2, want2 = stream_result(), batch_result(batches + [wave4])
    assert got2 == want2
    assert got2["http://a.example.com/p?a=1&b=2"] == (7, 99, 4)


def test_stream_url_dedup_guards(spark, tmp_path):
    """keep_versions < 2 is replay-unsafe and must raise; an uncommitted
    (no _SUCCESS) version directory is invisible to the reader."""
    import os

    import pytest as _pytest

    from capelinker_spark.streaming import (
        read_url_dedup_state,
        stream_url_dedup,
    )

    schema = "doc_id long, url string, warc_ts long"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "https://a.example/p", 10)], schema
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    with _pytest.raises(ValueError, match="keep_versions"):
        stream_url_dedup(
            stream, str(tmp_path / "ck"), str(tmp_path / "st"),
            keep_versions=1,
        )

    # committed version 0, then a crash-torn version 1 without _SUCCESS
    state = str(tmp_path / "state2")
    q = stream_url_dedup(stream, str(tmp_path / "ck2"), state)
    q.awaitTermination()
    torn = os.path.join(state, "current", "version=99")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    got = read_url_dedup_state(spark, state).collect()
    assert [(r.doc_id, r.n_snapshots) for r in got] == [(1, 1)]


def test_stream_snapshot_stats_matches_batch(spark, tmp_path):
    """Incremental per-URL snapshot stats ≡ the batch recompute over the
    union, with OUT-OF-ORDER arrivals (a late middle snapshot rewrites
    its neighbours' change comparisons — the case an associative fold
    cannot get right) and an idempotent restart wave."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from capelinker_spark.streaming import (
        read_snapshot_stats,
        stream_snapshot_stats,
    )

    schema = "doc_id long, url string, ts long, content string"
    batches = [
        [(1, "u1", 10, "a"), (2, "u1", 30, "b"), (3, "u2", 10, "x")],
        # ts=20 arrives LATE and lands BETWEEN u1's two existing
        # snapshots; content 'a' makes the 10->20 step unchanged and
        # the 20->30 step changed (was: one changed step 10->30)
        [(4, "u1", 20, "a"), (5, "u2", 20, "x")],
        [(6, "u3", 5, "q")],
    ]
    src = str(tmp_path / "pages")
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = str(tmp_path / "state")

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_snapshot_stats(stream, str(tmp_path / "ckpt"), state)
        q.awaitTermination()

    def batch_stats(waves):
        df = spark.createDataFrame([r for b in waves for r in b], schema)
        w = Window.partitionBy("url").orderBy(
            F.col("ts").asc(), F.col("doc_id").asc()
        )
        return {
            r.url: (r.n_snapshots, r.n_changes, r.last_ts)
            for r in (
                df.withColumn("_fp", F.xxhash64("content"))
                .withColumn("_prev", F.lag("_fp").over(w))
                .groupBy("url")
                .agg(
                    F.count(F.lit(1)).alias("n_snapshots"),
                    F.sum(
                        F.when(
                            F.col("_prev").isNotNull()
                            & (F.col("_fp") != F.col("_prev")),
                            1,
                        ).otherwise(0)
                    ).alias("n_changes"),
                    F.max("ts").alias("last_ts"),
                )
            ).collect()
        }

    def stream_stats():
        return {
            r.url: (r.n_snapshots, r.n_changes, r.last_ts)
            for r in read_snapshot_stats(spark, state).collect()
        }

    run_stream()
    got, want = stream_stats(), batch_stats(batches)
    assert got == want
    # the late-arrival semantics specifically: u1 history a@10, a@20,
    # b@30 -> exactly ONE changed consecutive step
    assert got["u1"] == (3, 1, 30)
    assert got["u2"] == (2, 0, 20)

    # restart: a fourth wave touching u1 again + a fresh url
    wave4 = [(7, "u1", 40, "c"), (8, "u4", 1, "z")]
    spark.createDataFrame(wave4, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_stream()
    got2, want2 = stream_stats(), batch_stats(batches + [wave4])
    assert got2 == want2
    assert got2["u1"] == (4, 2, 40)
    # untouched urls carried forward from the prior version
    assert got2["u3"] == (1, 0, 5)
