"""Structured-Streaming surface: incremental linkage over a page stream.

The reference is batch-only (SURVEY §2.8: "no streaming of any kind"), but
the graft's CC-style page table arrives continuously at web scale, so the
engine exposes the streaming-shaped composition of the same operators:

* ``stream_extract`` — the byte-identical extractor chain is pure narrow
  transformations, so it runs unchanged on a streaming DataFrame;
* ``page_ingest_stats`` — watermarked tumbling-window ingest metrics
  (the lineage row source for a continuous pipeline);
* ``incremental_link`` — foreachBatch micro-batch linkage of arriving
  records against a static, broadcast-sized reference table: each batch is
  soundex-blocked, Arrow-UDF scored with a pretrained model, rank-selected,
  and appended to the links sink. State lives in the sink (idempotent by
  persid pair), not in executors — restart-safe with checkpointLocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from capelinker_spark.extract import extract_records
from capelinker_spark.operators.candidates import candidates_multikey
from capelinker_spark.operators.features import add_wifeinboth, distcalc
from capelinker_spark.operators.predict import rank_links, select_links


def stream_extract(pages_stream: DataFrame) -> DataFrame:
    """Extractor on a streaming pages DataFrame (stateless narrow plan —
    spousenamedist is skipped because it needs a distinct+join; compute it
    downstream if needed)."""
    return extract_records(pages_stream, with_spousenamedist=False)


def page_ingest_stats(
    pages_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed ingest metrics per language."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text").cast("long")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_chars",
        )
    )


def dedup_stream(
    pages_stream: DataFrame,
    key: str = "url",
    watermark_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming dedup: keep the first occurrence of each key,
    with the watermark bounding state (re-crawled urls inside the horizon
    are dropped — the streaming analog of dedup_exact).

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates`` on a
    subset that EXCLUDES the event-time column never evicts its state
    (Spark only ages out streaming-dedup state when the event-time column
    is part of the dedup key), so the watermark would bound nothing. The
    WithinWatermark variant keys state on ``key`` alone and expires each
    entry once the watermark passes its event time — bounded state, and
    duplicates inside the horizon are still dropped."""
    return pages_stream.withWatermark(
        watermark_col, watermark
    ).dropDuplicatesWithinWatermark([key])


def stream_curate(
    docs_stream: DataFrame,
    min_tokens: int = 10,
    min_alpha_ratio: float = 0.5,
    text_col: str = "text",
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming corpus curation — the stages of ``curation.curate_corpus``
    that CAN stream, applied to a document stream:

    * quality filter (token count + alpha ratio): pure narrow expressions,
      stateless, identical semantics to batch;
    * exact dedup by CONTENT hash (md5 of the text): with a watermark,
      ``dropDuplicatesWithinWatermark`` — re-crawled/duplicated content
      inside the watermark horizon is dropped and per-hash state expires
      once the watermark passes its event time, so state stays bounded.
      (Plain ``dropDuplicates`` on a subset that excludes the event-time
      column would never evict state — Spark only ages streaming-dedup
      state when event time is part of the dedup key.)

    Adds ``n_tokens`` and ``content_hash`` columns. Semantics note vs
    batch ``dedup_exact``: batch keeps the MIN-id row per distinct text;
    the stream keeps the FIRST-ARRIVED row — identical when arrival order
    follows id order (replayed logs), and divergent only in which
    representative survives, never in the surviving content set. The
    remaining batch stages don't stream by nature: language mixing is a
    stateless filter (apply ``mixing.sample_to_rates`` downstream if
    rates are wanted on the stream too), and sequence packing needs a
    GLOBAL order — run ``packing.assign_packed_sequences`` as a batch job
    over the curated sink.

    ``watermark_col=None`` skips the watermark (unbounded dedup state —
    only for bounded replays/tests)."""
    from capelinker_spark.operators.textstats import alpha_ratio, token_count_ws

    c = F.col(text_col)
    filtered = (
        docs_stream.withColumn("n_tokens", token_count_ws(c))
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (alpha_ratio(c) > min_alpha_ratio)
        )
        .withColumn("content_hash", F.md5(c))
    )
    if watermark_col is not None:
        return filtered.withWatermark(
            watermark_col, watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    return filtered.dropDuplicates(["content_hash"])


def incremental_link(
    pages_stream: DataFrame,
    reference_records: DataFrame,
    scorer,
    checkpoint_dir: str,
    output_dir: str,
    minimum_confidence: float = 0.5,
    character_variables=("mlast", "mfirst", "wlast", "wfirst"),
    trigger_available_now: bool = True,
):
    """Link arriving pages to a static reference table, micro-batch by
    micro-batch. ``scorer`` is a LogisticModel-style object with
    ``transform(df)`` adding a ``predicted`` column. Returns the started
    StreamingQuery (append sink: parquet at ``output_dir``)."""
    records_stream = stream_extract(pages_stream)

    def link_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bv = "mlast"
        keys = [
            lambda df: F.soundex(F.col(bv)),
            lambda df: F.soundex(F.col(f"{bv}_woprefix")),
            lambda df: F.soundex(F.col("mfirst")),
        ]
        cnd = candidates_multikey(
            batch_df, reference_records, keys, keep_unmatched="none"
        )
        feats = distcalc(
            cnd,
            character_variables=character_variables,
            numeric_variables=("year",),
        )
        feats = add_wifeinboth(feats) if "wifepresent_from" in feats.columns else feats
        scored = scorer.transform(feats)
        ranked = rank_links(scored, "persid_from", "persid_to")
        links = select_links(ranked, minimum_confidence, "many:one").select(
            "persid_from", "persid_to", "predicted",
            F.lit(batch_id).alias("batch_id"),
        )
        links.write.mode("append").parquet(output_dir)

    writer = (
        records_stream.writeStream.foreachBatch(link_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "1 hour",
):
    """Stateful streaming sessionization via ``applyInPandasWithState`` —
    the custom-stateful-operator API the batch ``operators.events.sessionize``
    cannot express incrementally.

    Per-user state is three longs: (last event time µs, running session
    index, current session start µs). Each micro-batch sorts its arrivals
    by (ts, id), vectorizes the gap rule with numpy (boundary ⇔ gap >
    ``gap_minutes``), and carries the state forward. State for users idle
    past ``last + gap`` is evicted by an EVENT-TIME timeout against the
    watermark — bounded state, the thing that keeps a 10^12-event stream
    runnable.

    Session identity across eviction: after an idle user's state is
    evicted, their next arrival restarts the ``session`` INDEX at 1 — so
    the index alone can collide with that user's pre-eviction session 1
    (round-2 advice). The collision-free key is ``session_start`` (the
    session's first event time, emitted by BOTH this operator and batch
    ``sessionize``): (user, session_start) identifies sessions uniquely
    through any eviction, and on per-user-monotone arrivals (replayed
    logs, in-order file streams) matches batch output exactly — verified
    by tests/test_streaming.py including an evicted-then-returning user.
    Group on (user, session_start); treat ``session`` as a per-state-epoch
    ordinal only.

    Checkpoint compatibility: the state schema is (last_us, session,
    start_us) — one field wider than the pre-``session_start`` version.
    Spark does not support state-schema evolution for
    ``applyInPandasWithState``, so restarting an EXISTING query from an
    old checkpointLocation fails its state-compatibility check: resume
    old checkpoints with the old release, or start the upgraded query
    with a fresh checkpointLocation (standard Structured Streaming
    constraint for stateful operators).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000
    out_schema = (
        f"{user_col} long, {id_col} long, {ts_col} timestamp, session long, "
        "session_start timestamp"
    )
    state_schema = "last_us long, session long, start_us long"

    def assign(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (user,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, id_col], ignore_index=True)
        ts_us = rows[ts_col].astype("int64").to_numpy() // 1000
        last_us, sess, start_us = (
            state.get if state.exists else (None, 0, None)
        )
        prev = np.empty_like(ts_us)
        prev[1:] = ts_us[:-1]
        prev[0] = last_us if last_us is not None else np.iinfo(np.int64).min // 2
        boundary = (ts_us - prev) > gap_us
        if last_us is None:
            boundary[0] = True
        sessions = sess + np.cumsum(boundary)
        # forward-fill boundary timestamps: ts is sorted ascending, so the
        # running max of boundary-row µs is the current session's start;
        # rows before the batch's first boundary inherit the carried start
        seed = start_us if start_us is not None else np.iinfo(np.int64).min // 2
        starts = np.maximum.accumulate(np.where(boundary, ts_us, seed))
        state.update((int(ts_us[-1]), int(sessions[-1]), int(starts[-1])))
        # evict once the user has been silent past the gap (event time)
        state.setTimeoutTimestamp(int(ts_us[-1] // 1000) + gap_minutes * 60_000)
        yield pd.DataFrame(
            {
                user_col: rows[user_col],
                id_col: rows[id_col],
                ts_col: rows[ts_col],
                "session": sessions,
                "session_start": pd.to_datetime(starts * 1000),
            }
        )

    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            assign,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


class ComponentLabelStore:
    """Versioned persisted (node, component) table — the local stand-in
    for an Iceberg table with MERGE semantics: parquet under
    ``labels_dir/v=<batch_id>`` plus an atomically-replaced
    ``_LATEST.json`` manifest. ``fold`` is IDEMPOTENT under foreachBatch
    replays (a batch id ≤ the manifest version is already folded and
    skips — the same write-then-swap discipline as ``StageRunner``); old
    versions beyond ``keep_versions`` are pruned after the swap. Shared
    by ``stream_cluster_links`` and ``stream_neardup_canonical``.

    Every committed fold appends a lineage row to
    ``labels_dir/_lineage.jsonl`` (wave size, affected/merged component
    counts, new nodes, label-table rows, elapsed — the LineageLog
    convention the batch pipelines already follow), so "is incremental
    CC still flat at this graph size?" is answerable from ops metrics
    without reruns (round-5 verdict item 7). All metric counts run on
    batch-bounded frames; the label row count reuses the just-written
    parquet footer metadata."""

    def __init__(self, labels_dir: str, keep_versions: int = 2):
        import os

        self.labels_dir = labels_dir
        self.keep_versions = keep_versions
        os.makedirs(labels_dir, exist_ok=True)
        self._manifest = os.path.join(labels_dir, "_LATEST.json")

    def latest_version(self) -> int:
        import json
        import os

        if not os.path.exists(self._manifest):
            return -1
        with open(self._manifest) as fh:
            return json.load(fh)["v"]

    def read(self, spark) -> DataFrame:
        import os

        v = self.latest_version()
        if v < 0:
            raise FileNotFoundError(
                f"no committed label version under {self.labels_dir}"
            )
        return spark.read.parquet(os.path.join(self.labels_dir, f"v={v}"))

    def fold(
        self, edges: DataFrame, batch_id: int,
        src: str = "src", dst: str = "dst",
    ) -> bool:
        """Fold one wave of edges (``cluster.update_components``) and
        commit it as version ``batch_id``. Returns False when the batch
        was already folded (replay)."""
        import json
        import os
        import shutil
        import time

        from capelinker_spark.operators.cluster import update_components
        from capelinker_spark.qa.lineage import LineageLog

        v = self.latest_version()
        if batch_id <= v:
            return False
        t0 = time.time()
        spark = edges.sparkSession
        if v < 0:
            labels = (
                edges.select(F.col(src).alias("node"))
                .limit(0)
                .withColumn("component", F.col("node"))
            )
        else:
            labels = spark.read.parquet(
                os.path.join(self.labels_dir, f"v={v}")
            )
        stats: dict = {"batch_id": batch_id, "wave_edges": edges.count()}
        new_labels = update_components(
            labels, edges, src, dst, collect_stats=stats
        )
        out = os.path.join(self.labels_dir, f"v={batch_id}")
        new_labels.write.mode("overwrite").parquet(out)
        n_labels = spark.read.parquet(out).count()
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"v": batch_id}, fh)
        os.replace(tmp, self._manifest)
        vers = sorted(
            int(d[2:])
            for d in os.listdir(self.labels_dir)
            if d.startswith("v=")
        )
        for dv in vers[: -self.keep_versions]:
            shutil.rmtree(
                os.path.join(self.labels_dir, f"v={dv}"), ignore_errors=True
            )
        LineageLog(self.labels_dir).record(
            "cc_fold", time.time() - t0, row_count=n_labels, extra=stats
        )
        return True


def stream_cluster_links(
    links_stream: DataFrame,
    checkpoint_dir: str,
    labels_dir: str,
    src_col: str = "persid_from",
    dst_col: str = "persid_to",
    trigger_available_now: bool = True,
    keep_versions: int = 2,
):
    """Incremental connected components over the link stream — the
    streaming analog of ``expand_index`` (R/util.R:14-44) closing the
    composition ``incremental_link`` left open (round-4 verdict item 7):
    each micro-batch of accepted links is folded into the persisted
    ``ComponentLabelStore`` via ``cluster.update_components``, which
    re-propagates only the batch-affected subgraph (batch-sized CC + one
    mapping join over the table).

    Read the current clustering any time with
    ``read_component_labels(spark, labels_dir)``.
    """
    store = ComponentLabelStore(labels_dir, keep_versions)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # pin the micro-batch once: the fold runs several independent
        # actions (eager CC checkpoints, convergence counts, the label
        # write) and each would otherwise re-scan the streaming source
        # (round-5 review finding 5; dedup_batch already does this)
        edges = batch_df.select(src_col, dst_col).localCheckpoint(eager=True)
        store.fold(edges, batch_id, src_col, dst_col)

    writer = (
        links_stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_component_labels(spark, labels_dir: str) -> DataFrame:
    """Current (node, component) table maintained by
    ``stream_cluster_links`` / ``stream_neardup_canonical`` — raises
    FileNotFoundError before the first batch commits."""
    return ComponentLabelStore(labels_dir).read(spark)


def stream_neardup_canonical(
    docs_stream: DataFrame,
    checkpoint_dir: str,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    hash_fn: str = "md5",
    trigger_available_now: bool = True,
):
    """Incremental MinHash-LSH near-duplicate clustering over a document
    stream — the streaming composition of the batch dedup family
    (``dedup.near_duplicate_clusters``): every micro-batch of documents
    is signed, banded with the SAME band keys as the batch operator
    (``dedup.band_rows``), joined against the accumulated bucket table to
    find candidates (new-vs-old and new-vs-new), Jaccard-verified against
    the accumulated shingle table, and the surviving edges fold into the
    persisted ``ComponentLabelStore`` via incremental CC.

    Stream ≡ batch: every same-bucket pair is generated exactly once —
    when its LATER document arrives — and verification/threshold/min-id
    tie-breaks are identical expressions, so the final label table equals
    batch ``near_duplicate_clusters`` over the union (restricted to docs
    that matched anything; unmatched docs are canonical for themselves,
    resolved lazily at read time exactly like the batch operator's
    coalesce).

    State layout under ``state_dir`` (each an Iceberg-table stand-in):

    * ``bands/batch=<id>/``  — (doc_id, band, key) bucket rows;
    * ``shingles/batch=<id>/`` — (doc_id, shingles) for the verify join;
    * ``labels/`` — the versioned component store.

    Batch replays are idempotent end-to-end: the per-batch parquet dirs
    overwrite in place and the label fold skips already-committed batch
    ids. Scale shape per batch: the bucket join keys on (band, key) —
    new-batch rows against the accumulated table (at cluster scale the
    accumulated side is bucketed/partitioned BY key so the probe is
    partition-pruned); the verify join and CC fold are bounded by the
    candidate set, not the corpus.
    """
    import os

    from capelinker_spark.operators.dedup import (
        band_rows,
        minhash_table,
        ngram_jaccard,
        word_shingles,
    )

    spark = docs_stream.sparkSession
    bands_dir = os.path.join(state_dir, "bands")
    sh_dir = os.path.join(state_dir, "shingles")
    store = ComponentLabelStore(os.path.join(state_dir, "labels"))

    def _old_state(sub: str, batch_id: int, schema: str) -> DataFrame:
        """All PRIOR batches' rows (excluding this batch id — replay
        safety: a replayed batch must not see its own earlier write)."""
        base = os.path.join(state_dir, sub)
        dirs = [
            os.path.join(base, d)
            for d in (os.listdir(base) if os.path.isdir(base) else [])
            if d.startswith("batch=") and int(d[6:]) < batch_id
        ]
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*dirs)

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = batch_df.select(id_col, text_col).localCheckpoint(eager=True)
        # the empty-prior-state schema must carry the CORPUS id type —
        # a hardcoded `long` only worked for long ids because batch-0's
        # unionByName silently widened it; string ids would diverge.
        id_type = docs.schema[id_col].dataType.simpleString()

        mh = minhash_table(
            docs, text_col, id_col, num_hashes, shingle_words, hash_fn
        )
        new_bands = band_rows(mh, id_col, num_hashes, bands)
        new_sh = docs.select(
            F.col(id_col),
            word_shingles(F.col(text_col), shingle_words).alias("shingles"),
        )
        # persist FIRST (overwrite → replay-idempotent), then read back so
        # the joins below scan parquet instead of recomputing signatures
        new_bands.write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch={batch_id}")
        )
        new_sh.write.mode("overwrite").parquet(
            os.path.join(sh_dir, f"batch={batch_id}")
        )
        new_bands = spark.read.parquet(
            os.path.join(bands_dir, f"batch={batch_id}")
        )
        new_sh = spark.read.parquet(os.path.join(sh_dir, f"batch={batch_id}"))

        old_bands = _old_state(
            "bands", batch_id, f"{id_col} {id_type}, band int, key string"
        )
        # candidates: new docs vs (old ∪ new). Ids do NOT arrive in order,
        # so the pair is normalized with least/greatest (a bare
        # id_a < id_b would drop every cross-batch pair whose NEW doc has
        # the smaller id); distinct collapses the within-batch mirror
        # orientations. Each pair still generates exactly once across
        # batches — candidates always involve ≥1 new doc.
        all_bands = old_bands.unionByName(new_bands)
        cand = (
            new_bands.select(F.col(id_col).alias("_nid"), "band", "key")
            .join(
                all_bands.select(F.col(id_col).alias("_oid"), "band", "key"),
                ["band", "key"],
            )
            .where(F.col("_nid") != F.col("_oid"))
            .select(
                F.least("_nid", "_oid").alias("id_a"),
                F.greatest("_nid", "_oid").alias("id_b"),
            )
            .distinct()
        )
        old_sh = _old_state(
            "shingles", batch_id, f"{id_col} {id_type}, shingles array<string>"
        )
        all_sh = old_sh.unionByName(new_sh)
        edges = (
            cand.join(
                all_sh.select(
                    F.col(id_col).alias("id_a"), F.col("shingles").alias("_sa")
                ),
                "id_a",
            )
            .join(
                all_sh.select(
                    F.col(id_col).alias("id_b"), F.col("shingles").alias("_sb")
                ),
                "id_b",
            )
            .where(ngram_jaccard(F.col("_sa"), F.col("_sb")) >= threshold)
            .select("id_a", "id_b")
        )
        store.fold(edges, batch_id, "id_a", "id_b")

    writer = (
        docs_stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_decontaminate(
    docs_stream: DataFrame,
    contamination: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    contam_text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Streaming span-level benchmark decontamination — the streaming
    analog of batch ``dedup.remove_contaminated_spans`` (dd11), closing
    the one curation stage that had no streaming tier (round-5 verdict
    item 6): every micro-batch of documents is rewritten against the
    STATIC contamination set (eval benchmarks change per release, not
    per batch), removing only the words covered by a contaminated
    n-gram.

    Stream ≡ batch holds exactly: the rewrite is a pure function of
    (document, contamination set) — no cross-document state — so the
    union of per-batch outputs is byte-identical to the batch operator
    over the union of inputs, regardless of batch boundaries, arrival
    order, or replays.

    Plan shape per batch (inherited from the batch operator): the
    contamination n-gram set is benchmark-sized and BROADCASTS; the
    batch's positional grams probe it with a broadcast semi-join — the
    corpus side never shuffles on the gram key; the only corpus-keyed
    exchange is the per-doc start aggregation, bounded by the
    micro-batch.

    Output layout: ``out_dir/batch=<id>/`` parquet dirs of
    ``(id, clean_text, n_words, n_removed)`` — overwrite-in-place per
    batch id, so replays after a checkpoint rollback are idempotent
    (the stream_neardup_canonical state convention). Read the curated
    corpus back with ``spark.read.parquet(out_dir)``.
    """
    import os

    from capelinker_spark.operators.dedup import remove_contaminated_spans

    def decon_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cleaned = remove_contaminated_spans(
            batch_df.select(id_col, text_col),
            contamination,
            n=n,
            text_col=text_col,
            id_col=id_col,
            contam_text_col=contam_text_col,
        )
        cleaned.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    writer = (
        docs_stream.writeStream.foreachBatch(decon_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_point_in_time_enrich(
    facts_stream: DataFrame,
    dim: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
    on: str | list[str] = "id",
    fact_time: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    trigger_available_now: bool = True,
):
    """Streaming point-in-time dimension enrichment — the streaming
    analog of batch ``temporal.point_in_time_join`` (tm5): every
    micro-batch of facts (crawl events, link observations) is joined to
    the SCD-2 dimension version valid AT THE FACT'S OWN TIMESTAMP, so a
    late-arriving event still gets the attributes in force when it
    happened, not today's — the property a plain stream-static
    equi-join on the current version gets wrong.

    Stream ≡ batch holds exactly: the lookup is a pure function of
    (fact row, dimension table) — no cross-fact state — so the union of
    per-batch outputs equals the batch operator over the union of
    inputs, under any batch boundaries, arrival order, or replays.

    The dimension is STATIC per run (the SCD-2 table is itself
    maintained by a slower batch/tm4 job); re-deploy the stream to pick
    up a new dimension snapshot — the per-batch overwrite sink makes a
    backfill replay idempotent. Per batch the work is one
    ``point_in_time_join`` of the micro-batch against the dimension:
    ONE shuffle of |batch|+|dim| on the key, no join node, no interval
    explosion (the asof union-tag-window plan). For a dimension too
    large to re-shuffle per micro-batch, pre-bucket it on the key and
    persist — the same exchange-reuse lever the batch pipeline has.

    Output layout: ``out_dir/batch=<id>/`` parquet dirs (the
    stream_decontaminate sink convention); read the enriched facts back
    with ``spark.read.parquet(out_dir)``.
    """
    import os

    from capelinker_spark.operators.temporal import point_in_time_join

    def enrich_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = point_in_time_join(
            batch_df, dim, on, fact_time,
            valid_from=valid_from, valid_to=valid_to,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    writer = (
        facts_stream.writeStream.foreachBatch(enrich_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()



def _committed_versions(base: str, prefix: str) -> list[int]:
    """Sorted ids of COMMITTED state dirs under ``base`` named
    ``<prefix><id>``: Spark's parquet committer writes _SUCCESS last,
    so a crash-torn write has no marker and must be invisible to both
    folds and readers. THE one implementation of the convention."""
    import os

    if not os.path.isdir(base):
        return []
    n = len(prefix)
    return sorted(
        int(d[n:])
        for d in os.listdir(base)
        if d.startswith(prefix)
        and os.path.exists(os.path.join(base, d, "_SUCCESS"))
    )


def stream_url_dedup(
    pages_stream: DataFrame,
    checkpoint_dir: str,
    state_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tie_col: str = "doc_id",
    keep_versions: int = 2,
    trigger_available_now: bool = True,
):
    """Streaming crawl-snapshot URL dedup — the incremental form of
    batch ``urls.dedup_urls_keep_latest`` (dd13): as crawl waves
    arrive, the state table always holds, per canonical URL, the
    NEWEST snapshot seen so far plus the total snapshot count.

    Stream ≡ batch holds EXACTLY, under any batch boundaries, arrival
    order, or replays: keep-latest under the deterministic
    (ts DESC, tie ASC) order is an associative commutative fold (the
    per-key argmax is a semilattice — folding the running winner
    against a new wave and re-taking the argmax IS the global argmax),
    and the snapshot count is additive (prior count + wave count).
    No approximation tier, unlike streaming LSH near-dup where
    stream ≡ batch needs the candidate-generation argument.

    State: ``state_dir/current/version=<batch_id>/`` parquet versions
    (the ComponentLabelStore convention) — a replayed batch overwrites
    its own version and folds from the newest version BELOW its batch
    id, so restarts are idempotent; ``keep_versions`` newest versions
    are retained. Per batch the work is ONE window shuffle of
    |state| + |batch| rows on ``canon_url`` — at crawl scale partition
    the state table by canonical key so the fold co-locates, and
    compact it on the same cadence as the label store.
    """
    import os
    import shutil

    from pyspark.sql import Window

    from capelinker_spark.operators.urls import normalize_url

    if keep_versions < 2:
        # a replayed batch folds from the newest version BELOW its id;
        # with only 1 retained version that prior is already pruned and
        # the replay would silently restart from empty state
        raise ValueError("keep_versions must be >= 2 (replay safety)")

    spark = pages_stream.sparkSession
    cur_dir = os.path.join(state_dir, "current")

    def _versions() -> list[int]:
        return _committed_versions(cur_dir, "version=")

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = batch_df.select(tie_col, url_col, ts_col)
        tie_t = b.schema[tie_col].dataType.simpleString()
        ts_t = b.schema[ts_col].dataType.simpleString()
        new = b.withColumn(
            "canon_url", normalize_url(F.col(url_col))
        ).withColumn("n_snapshots", F.lit(1).cast("long"))
        prior_vs = [v for v in _versions() if v < batch_id]
        if prior_vs:
            prior = spark.read.parquet(
                os.path.join(cur_dir, f"version={prior_vs[-1]}")
            )
        else:
            prior = spark.createDataFrame(
                [],
                f"{tie_col} {tie_t}, {url_col} string, {ts_col} {ts_t}, "
                "canon_url string, n_snapshots long",
            )
        merged = prior.unionByName(new)
        part = Window.partitionBy("canon_url")
        w = part.orderBy(F.col(ts_col).desc(), F.col(tie_col).asc())
        folded = (
            merged.withColumn("_n", F.sum("n_snapshots").over(part))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                tie_col, url_col, ts_col, "canon_url",
                F.col("_n").alias("n_snapshots"),
            )
        )
        out = os.path.join(cur_dir, f"version={batch_id}")
        folded.write.mode("overwrite").parquet(out)
        for v in _versions()[:-keep_versions]:
            shutil.rmtree(
                os.path.join(cur_dir, f"version={v}"), ignore_errors=True
            )

    writer = (
        pages_stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_url_dedup_state(spark, state_dir: str) -> DataFrame:
    """Latest keep-latest URL table written by stream_url_dedup."""
    import os

    cur_dir = os.path.join(state_dir, "current")
    vs = _committed_versions(cur_dir, "version=")
    if not vs:
        raise FileNotFoundError(f"no url-dedup state under {state_dir}")
    return spark.read.parquet(os.path.join(cur_dir, f"version={vs[-1]}"))


def stream_snapshot_stats(
    pages_stream: DataFrame,
    checkpoint_dir: str,
    state_dir: str,
    url_col: str = "url",
    ts_col: str = "ts",
    content_col: str = "content",
    tie_col: str = "doc_id",
    keep_versions: int = 2,
    trigger_available_now: bool = True,
):
    """Incremental snapshot change statistics — the streaming analog of
    batch dd14 and the state the crawl frontier (wt7) reads: per URL,
    capture count, consecutive-change count (in (ts, tie) capture
    order), last capture time, change rate.

    Change counting is NOT an associative fold (a late-arriving middle
    snapshot rewrites its neighbours' comparisons), so unlike
    stream_url_dedup this operator keeps the RAW (url, ts, fp, tie)
    capture log in append-only per-batch dirs and, each micro-batch,
    recomputes stats ONLY for the URLs that batch touches — the
    affected-key recompute discipline of incremental CC. Stream ≡
    batch therefore holds EXACTLY under any batch boundaries, arrival
    order, or replays (a replayed batch overwrites its own log dir and
    its own stats version; both discoveries are _SUCCESS-gated).

    State layout: ``snapshots/batch=<id>/`` capture-log parquet (the
    content column is stored as an xxhash64 fingerprint — change
    detection needs equality only) and ``stats/version=<id>/`` the
    merged stats table (``keep_versions`` retained, >= 2 for replay
    safety). At crawl scale partition both by the canonical URL so the
    affected-key semi-join and the recompute co-locate; compact the
    log on the dedup cadence.
    """
    import os
    import shutil

    from pyspark.sql import Window

    if keep_versions < 2:
        raise ValueError("keep_versions must be >= 2 (replay safety)")

    spark = pages_stream.sparkSession
    snap_dir = os.path.join(state_dir, "snapshots")
    stats_dir = os.path.join(state_dir, "stats")

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = batch_df.select(
            url_col, ts_col, tie_col,
            F.xxhash64(F.col(content_col)).alias("_fp"),
        )
        out_snap = os.path.join(snap_dir, f"batch={batch_id}")
        rows.write.mode("overwrite").parquet(out_snap)
        affected = (
            spark.read.parquet(out_snap).select(url_col).distinct()
        )
        log_dirs = [
            os.path.join(snap_dir, f"batch={v}")
            for v in _committed_versions(snap_dir, "batch=")
            if v <= batch_id
        ]
        history = spark.read.parquet(*log_dirs).join(
            F.broadcast(affected), url_col, "left_semi"
        )
        from capelinker_spark.operators.urls import (
            snapshot_change_stats,
        )

        fresh = snapshot_change_stats(
            history, url_col=url_col, ts_col=ts_col, fp_col="_fp",
            tie_col=tie_col,
        )
        prior_vs = [v for v in _committed_versions(stats_dir, "version=")
                    if v < batch_id]
        if prior_vs:
            prior = spark.read.parquet(
                os.path.join(stats_dir, f"version={prior_vs[-1]}")
            ).join(F.broadcast(affected), url_col, "left_anti")
            merged = prior.unionByName(fresh)
        else:
            merged = fresh
        out_stats = os.path.join(stats_dir, f"version={batch_id}")
        merged.write.mode("overwrite").parquet(out_stats)
        for v in _committed_versions(stats_dir, "version=")[:-keep_versions]:
            shutil.rmtree(
                os.path.join(stats_dir, f"version={v}"),
                ignore_errors=True,
            )

    writer = (
        pages_stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_snapshot_stats(spark, state_dir: str) -> DataFrame:
    """Latest stats table written by stream_snapshot_stats."""
    import os

    base = os.path.join(state_dir, "stats")
    vs = _committed_versions(base, "version=")
    if not vs:
        raise FileNotFoundError(f"no snapshot stats under {state_dir}")
    return spark.read.parquet(os.path.join(base, f"version={vs[-1]}"))
