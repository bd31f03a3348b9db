"""Generate EXPLAIN.md: formatted physical plans of the engine's key
operators, annotated with what to look for (pushdown, broadcast vs SMJ,
single ArrowEvalPython pass, exchange reuse). Run: python tools/explain_report.py"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt(df) -> str:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # keep it readable: drop exchange ids / stats clutter
    plan = re.sub(r"\[plan_id=\d+\]", "", plan)
    return plan


def main():
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("explain-report")
        .getOrCreate()
    )
    from capelinker_spark.extract import extract_records
    from capelinker_spark.fixtures import make_corpus, pages_df
    from capelinker_spark.operators.candidates import candidates
    from capelinker_spark.operators.features import add_matches, distcalc
    from capelinker_spark.util import ensure_workers_importable

    ensure_workers_importable(spark)
    corpus = make_corpus(n_entities=100, seed=42)
    pages = pages_df(spark, corpus["pages"])
    d = tempfile.mkdtemp()
    extract_records(pages).write.mode("overwrite").partitionBy("year").parquet(
        f"{d}/records"
    )
    records = spark.read.parquet(f"{d}/records")

    sections = []

    scan = records.where(F.col("year") == 1828).select("persid", "mlast")
    sections.append((
        "Extractor checkpoint scan: partition pruning + column pruning",
        "Look for: `PartitionFilters: [isnotnull(year), (year = 1828)]` and a "
        "two-column `ReadSchema` — the year predicate never touches data "
        "files outside the 1828 partition (Iceberg partition-pruning analog).",
        _fmt(scan),
    ))

    cnd = candidates(
        records.where(F.col("year") == 1828),
        records.where(F.col("year") == 1826),
        blocktype="soundex",
        keep_unmatched="none",
    )
    sections.append((
        "Soundex blocking join",
        "Look for: the pair-generation join on `soundex(...)` (broadcast at "
        "this scale; sort-merge + AQE skew splitting at cluster scale) and "
        "the assembly joins on the id keys. No cartesian product anywhere.",
        _fmt(cnd.select("persid_from", "persid_to", "score")),
    ))

    feats = distcalc(
        cnd.repartition(8, F.col("persid_from")),
        character_variables=("mlast", "mfirst", "wlast"),
        numeric_variables=("year",),
    )
    feats = add_matches(feats, "persid_from")
    sections.append((
        "Pairwise features: one Arrow pass + fused window exchange",
        "Look for: a SINGLE `ArrowEvalPython` node carrying all JW UDF "
        "columns (one Python round-trip per batch), and the `matches` "
        "Window reusing the `hashpartitioning(persid_from)` exchange "
        "introduced by the repartition (no second shuffle).",
        _fmt(feats.select("persid_from", "persid_to", "mlastdist", "matches")),
    ))

    from capelinker_spark.entry_queries import QUERIES

    q1 = QUERIES["q1_flagship_agg"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Flagship aggregation (TPC-H-Q1-shaped)",
        "Look for: `HashAggregate` partial → exchange → final (map-side "
        "combine), whole-stage codegen spans over the scan+project+partial.",
        _fmt(q1),
    ))

    dm2 = QUERIES["dm2_sequence_packing"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Sequence packing (global prefix sum, dm2)",
        "Look for: the global token prefix sum runs as a RANGE exchange + "
        "per-partition `Window` (partitionBy the partition id) + a "
        "`BroadcastHashJoin` attaching the per-partition offsets — NO "
        "`Exchange SinglePartition` anywhere "
        "(tests/test_packing.py::test_packing_plan_is_parallel asserts it).",
        _fmt(dm2),
    ))

    dm1 = QUERIES["dm1_stratified_sample"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Deterministic stratified sampling (dm1)",
        "Look for: the per-class keep rule is a single codegen `Filter` "
        "directly over the scan — no shuffle, no Python; sampling rides in "
        "the scan stage.",
        _fmt(dm1),
    ))

    dd7 = QUERIES["dd7_decontaminate"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Benchmark decontamination (dd7)",
        "Look for: the corpus side is scan → explode(shingles) → "
        "`BroadcastHashJoin ... LeftSemi, BuildRight` probing the BROADCAST "
        "contamination n-gram set — the corpus itself never shuffles; the "
        "only exchanges are on the tiny gram/hit sets "
        "(tests/test_entry_contract.py::test_decontaminate_plan_broadcasts_grams).",
        _fmt(dd7),
    ))

    dm4 = QUERIES["dm4_temperature_mix"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Temperature mixture rebalancing (dm4)",
        "Look for: after the one bounded class-count collect (driver-side "
        "rate math), the applied schedule is the SAME single codegen "
        "`Filter` shape as dm1 — a CASE over planted literal hex bounds, no "
        "shuffle, no Python in the kept-rows plan.",
        _fmt(dm4),
    ))

    cu2 = QUERIES["cu2_line_filter"](spark, "/root/testdata/sf0.001")
    sections.append((
        "C4-style line filtering (cu2)",
        "Look for: split → `filter(lambda …)` → array_join all inside one "
        "whole-stage-codegen `Project`/`Filter` over the scan — line-level "
        "cleanup costs one narrow pass, no Python, no shuffle.",
        _fmt(cu2),
    ))

    ts9 = QUERIES["ts9_bigram_lm_score"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Corpus bigram-LM scoring (ts9)",
        "Look for: the model fit is two partial→final `HashAggregate` "
        "pairs (bigram counts, context counts — both map-side combinable) "
        "joined back onto the exploded bigrams; the per-doc sum accumulates "
        "DECIMAL(18,6) terms (order-independent exact), and nothing leaves "
        "the JVM — no Python anywhere in a corpus-wide LM fit + score. "
        "The one `SinglePartition` exchange is the lazy vocab-size "
        "scalar: a global count_distinct FINISHER over one "
        "partial-count row per partition — a 1-row reduction, not a "
        "data funnel.",
        _fmt(ts9),
    ))

    dd9 = QUERIES["dd9_remove_dup_spans"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Duplicated-span REMOVAL (dd9)",
        "Look for: the positional gram table shuffles ONCE (`Window` over "
        "the gram key computes the min≠max ≥2-distinct-docs test — no "
        "per-gram doc lists), shared-gram start offsets aggregate per doc "
        "(partial→final HashAggregate), and the text rebuild is a native "
        "higher-order `filter`/`exists` in one codegen `Project` after the "
        "join back — zero Python, no `Exchange SinglePartition`.",
        _fmt(dd9),
    ))

    cu5 = QUERIES["cu5_domain_policy_curation"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Per-domain curation policies (cu5)",
        "Look for: the registrable-domain parse evaluated ONCE and "
        "LEFT-joined against the BROADCAST policy table "
        "(`BroadcastHashJoin ... LeftOuter` over a config-sized "
        "LocalTableScan — the corpus never shuffles), then one codegen "
        "filter with the md5 keep rule and the same single sigmoid as "
        "cu3. The CASE-over-literal form was rejected: each CASE arm "
        "re-inlines the nested-regexp domain parse under filter "
        "pushdown and blew the fused stage past janino's 64 KB method "
        "limit, dropping the query out of whole-stage codegen. No "
        "Python anywhere.",
        _fmt(cu5),
    ))

    dd11 = QUERIES["dd11_remove_contaminated_spans"](
        spark, "/root/testdata/sf0.001"
    )
    sections.append((
        "Span-level decontamination (dd11)",
        "Look for: the corpus's positional grams probe the BROADCAST "
        "contamination gram set via `BroadcastHashJoin ... LeftSemi` — "
        "the corpus never shuffles on the gram key (dd7's plan property, "
        "kept in the action tier); the only corpus-keyed exchange is the "
        "per-doc start aggregation, and the rebuild is the same native "
        "higher-order filter as dd9. Zero Python.",
        _fmt(dd11),
    ))

    dd10 = QUERIES["dd10_paragraph_dedup"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Exact-paragraph dedup (dd10)",
        "Look for: one `Window` shuffle keyed on the paragraph VALUE "
        "(min/max id counters — never a per-paragraph doc list), a "
        "partial→final HashAggregate rebuilding each doc from its "
        "position-sorted kept paragraphs, and a left join back onto the "
        "narrow doc table. No Python, no `Exchange SinglePartition`.",
        _fmt(dd10),
    ))

    tok1 = QUERIES["tok1_word_counts"](spark, "/root/testdata/sf0.001")
    sections.append((
        "BPE tokenizer training, distributed stage (tok1)",
        "Look for: scan → regexp_extract_all + explode (generate) → "
        "partial→final `HashAggregate` — a single map-side-combinable "
        "count over the corpus; the iterative merge learning consumes "
        "this bounded histogram on the driver (train_bpe), so the "
        "distributed footprint of tokenizer training is exactly this "
        "one shuffle.",
        _fmt(tok1),
    ))

    tm1 = QUERIES["tm1_asof_join"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Backward as-of join (tm1)",
        "Look for: NO join node at all — the union-tag-window form is "
        "`Union` → ONE `Exchange hashpartitioning(user_id)` → `Window` "
        "(`last(_payload, ignorenulls)` over the unbounded-preceding "
        "frame) → filter to the left rows. One shuffle of |L|+|R| rows "
        "replaces the join-explode-argmax plan entirely "
        "(tests/test_temporal.py::test_asof_plan_single_shuffle_no_python "
        "asserts the single exchange).",
        _fmt(tm1),
    ))

    er7 = QUERIES["er7_bcubed"](spark, "/root/testdata/sf0.001")
    sections.append((
        "B-cubed clustering metrics (er7)",
        "Look for: three partial→final `HashAggregate` pairs (cell, "
        "predicted-cluster and gold-entity sizes), two equi-joins of the "
        "CELL table (bounded by #clusters × #entities, not records) to "
        "the size tables, and one global 1-row reduction — a 10⁹-record "
        "clustering is evaluated without enumerating a single pair. "
        "Contributions are integer-quantized, so the plan is "
        "order-independent end to end.",
        _fmt(er7),
    ))

    ir1 = QUERIES["ir1_bm25_topk"](spark, "/root/testdata/sf0.001")
    sections.append((
        "BM25 keyword retrieval (ir1)",
        "Look for: the corpus side is ONE tall (doc, term, tf) table "
        "(explode + hash-agg) joined to the tiny query-term table on the "
        "TERM — a posting-list equi-join (broadcast at this scale), "
        "never a per-query corpus scan — then a per-(query, doc) "
        "score aggregate and a top-k window per query.",
        _fmt(ir1),
    ))

    dd12 = QUERIES["dd12_line_dedup_keep_first"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Corpus-global line dedup, keep-first (dd12)",
        "Look for: the exploded line table shuffles ONCE on the line "
        "VALUE — two stacked `Window` aggregates (global min occurrence; "
        "min≠max duplicate test) reuse the SAME hashpartitioning "
        "exchange — then a per-doc position-sorted rebuild. No "
        "per-line doc lists, no second shuffle, no Python.",
        _fmt(dd12),
    ))

    j11 = QUERIES["j11_prefix_jaccard_join"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Exact prefix-filter Jaccard join (j11, AllPairs/PPJoin)",
        "Look for: a doc-frequency `HashAggregate` feeding the "
        "per-record rarest-first sort (sort_array inside a project — "
        "bounded by record token count, no exchange), prefix explode, "
        "ONE self-equi-join on `xxhash64(token)` with the integer "
        "length filter, and verification joins carrying the token "
        "arrays. No cartesian product anywhere; every similarity "
        "filter is integer arithmetic.",
        _fmt(j11),
    ))

    tm3 = QUERIES["tm3_interval_join"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Bucketed interval overlap join (tm3)",
        "Look for: both sides explode spans into width-8 buckets "
        "(`Generate sequence(...)`), then ONE equi-join on "
        "(key, bucket) — no `BroadcastNestedLoopJoin`, which is what "
        "Spark plans for a bare inequality join — and the exact overlap "
        "filter plus the overlap-start-bucket equality that dedupes "
        "pairs WITHOUT a distinct shuffle.",
        _fmt(tm3),
    ))

    er12 = QUERIES["er12_nmi"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Normalized Mutual Information (er12)",
        "Look for: three partial→final `HashAggregate` pairs over the "
        "assignment table (cell / pred / gold size histograms), each "
        "reduced to a 1-row DECIMAL(38,6) log-sum and crossJoined as a "
        "lazy scalar — entropy and MI at any scale without enumerating "
        "pairs, order-independent because every ln term is quantized "
        "before summation.",
        _fmt(er12),
    ))

    pr1 = QUERIES["pr1_pagerank"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Fixed-iteration PageRank (pr1)",
        "Look for: per iteration exactly one `SortMergeJoin`/shuffled "
        "hash join of the outdeg-annotated edge table against the rank "
        "`Scan ExistingRDD` (the truncated checkpoint), one partial→"
        "final `HashAggregate` on dst, and one left join back onto the "
        "node table — all integer expressions (`div`), no Python, no "
        "cartesian. The `Scan ExistingRDD` leaves are "
        "`checkpoint_truncated` lineage cuts, so plan depth stays "
        "constant per iteration instead of compounding.",
        _fmt(pr1),
    ))

    tm5 = QUERIES["tm5_point_in_time_join"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Point-in-time SCD-2 lookup (tm5)",
        "Look for: the SCD-2 builder and the as-of lookup riding ONE "
        "`Exchange hashpartitioning(id)` each — facts and versions "
        "union into a single keyed window (`last(_payload, true)`), "
        "NO join node and no inequality-join "
        "`BroadcastNestedLoopJoin`; the closed-interval bounds check "
        "is a post-hoc CASE, not a second pass.",
        _fmt(tm5),
    ))

    cu8 = QUERIES["cu8_domain_rollup"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Per-domain corpus rollup (cu8)",
        "Look for: the registrable-domain parse and quality sigmoid "
        "fused into the scan-side project, then ONE partial→final "
        "`HashAggregate` pair around a single "
        "`Exchange hashpartitioning(domain)` — the LONG micro-unit "
        "quality sums combine map-side, so the shuffle carries only "
        "#domains-sized partials.",
        _fmt(cu8),
    ))

    er16 = QUERIES["er16_adamic_adar"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Adamic-Adar link prediction (er16)",
        "Look for: one degree `HashAggregate` over the doubled "
        "adjacency, the integer weight `1000000000000 div cast(floor("
        "LN(...)))` fused into the center project, ONE wedge "
        "self-equi-join on the center key, one partial→final pair "
        "aggregate, and a final `LeftAnti` join dropping existing "
        "edges. No cartesian product; the only float is the last "
        "de-scaling division.",
        _fmt(er16),
    ))

    ir2 = QUERIES["ir2_rrf_fusion"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Reciprocal-rank fusion (ir2)",
        "Look for: the BM25 branch (postings shuffle + broadcast query "
        "terms + per-query rank window) and the dense branch "
        "(`BroadcastNestedLoopJoin` of the 3 QUERY vectors against the "
        "corpus — the documented exact-baseline cross join, query-side "
        "only) feeding a `Union`, then ONE `HashAggregate` on "
        "(query, doc) summing the integer `div` terms and one final "
        "top-k window. Fusion never re-touches the corpus: its inputs "
        "are the two top-20 lists.",
        _fmt(ir2),
    ))

    tm6 = QUERIES["tm6_scd2_merge"](spark, "/root/testdata/sf0.001")
    sections.append((
        "SCD-2 timeline stitching (tm6)",
        "Look for: the boundary-union distinct and lead window, then "
        "TWO as-of union-tag-window blocks (`last(_payload, true)`) — "
        "one per input history — each riding a hashpartitioning(id) "
        "exchange, with NO join node, no `BroadcastNestedLoopJoin` "
        "(what a naive interval-containment join would plan), and no "
        "interval explosion.",
        _fmt(tm6),
    ))

    m9 = QUERIES["m9_pr_sweep"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Distributed PR threshold sweep (m9)",
        "Look for: ONE partial→final `HashAggregate` pair over the "
        "scored corpus (<=1000 bucket rows), a `BroadcastExchange` of "
        "the 20-row threshold grid feeding a nested-loop join that is "
        "bounded by buckets x thresholds (not the corpus), and one "
        "tiny final aggregate — the corpus is scanned once for the "
        "whole sweep.",
        _fmt(m9),
    ))

    wt2 = QUERIES["wt2_extract_links"](spark, "/root/testdata/sf0.001")
    sections.append((
        "HTML link extraction (wt2)",
        "Look for: a SINGLE `Project`+`Generate explode` over the scan — "
        "no Exchange anywhere (extraction is map-only; at 100 TB it rides "
        "the crawl partitioning), no `BatchEvalPython` (regexp_extract_all "
        "/ arrays_zip / native resolve+strip expressions only).",
        _fmt(wt2),
    ))

    wt3 = QUERIES["wt3_host_pagerank"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Host-graph PageRank composition (wt3)",
        "Look for: the map-only wt2 extraction feeding ONE distinct "
        "HashAggregate (the host-edge table), then pr1's per-iteration "
        "shape — edge⋈rank shuffle join, hash agg on dst, node left "
        "join — over `LogicalRDD` leaves (checkpoint_truncated lineage "
        "cuts between iterations).",
        _fmt(wt3),
    ))

    dd13 = QUERIES["dd13_url_dedup_keep_latest"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Crawl-snapshot URL dedup (dd13)",
        "Look for: ONE `Exchange hashpartitioning(canon_url)` with the "
        "snapshot-count window and the keep-latest row_number window "
        "STACKED on it (the dd12 discipline) — canonicalization itself "
        "is narrow regexp/array work in the same codegen stage.",
        _fmt(dd13),
    ))

    f17 = QUERIES["f17_soft_tfidf"](spark, "/root/testdata/sf0.001")
    sections.append((
        "SoftTFIDF hybrid similarity (f17)",
        "Look for: the corpus df aggregate + a 1-row `BroadcastExchange` "
        "for N (the lazy-scalar rule), ONE `ArrowEvalPython` for the "
        "word-pair JW kernel (the only Python, Arrow-batched), the "
        "argmax window on (pid, word), and weight/norm joins all keyed "
        "on the pair id — no cartesian, no per-row Python.",
        _fmt(f17),
    ))

    wt6 = QUERIES["wt6_robots_allowed"](spark, "/root/testdata/sf0.001")
    sections.append((
        "robots.txt politeness matcher (wt6)",
        "Look for: the robots-line windows (lag, running group sum, "
        "group/host flags) ALL stacked on `hashpartitioning(host)`, the "
        "URL side joining the tiny rule table on host (broadcastable), "
        "LIKE-with-escape matching (no per-row regex compile), and one "
        "per-URL argmax window — no Python anywhere.",
        _fmt(wt6),
    ))

    ir3 = QUERIES["ir3_bm25f_anchor_topk"](spark, "/root/testdata/sf0.001")
    sections.append((
        "BM25F anchor-boosted retrieval (ir3)",
        "Look for: one postings HashAggregate pair per field, the "
        "cross-field combine as ONE more (id, term) hash agg over the "
        "union, 1-row `BroadcastExchange`s for avgdl/N (lazy scalars), "
        "the query-term broadcast join, and ONE ArrowEvalPython (the "
        "CPython-log idf over the distinct-term table only).",
        _fmt(ir3),
    ))

    dm5 = QUERIES["dm5_weighted_sample"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Weighted sampling without replacement (dm5)",
        "Look for: `TakeOrderedAndProject` as the top node — the global "
        "top-k is per-partition heaps + a k-row merge, NO "
        "`Exchange SinglePartition`; one ArrowEvalPython computes the "
        "CPython-libm priority (oracle tier; the xxhash64 tier is "
        "all-native).",
        _fmt(dm5),
    ))

    out = ["# EXPLAIN — physical plans of the key operators\n"]
    out.append(
        "Generated by `python tools/explain_report.py` (local[4], sf0.001 "
        "fixture data). Annotations state the property each plan is expected "
        "to exhibit; tests assert the load-bearing ones "
        "(tests/test_entry_contract.py::test_partitioned_checkpoint_pruning, "
        "tests/test_pipeline.py::test_no_per_row_python).\n"
    )
    for title, note, plan in sections:
        out.append(f"## {title}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
