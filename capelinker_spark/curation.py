"""End-to-end corpus curation: the composition a training-data pipeline
actually runs over raw web documents —

    exact dedup → quality filter → language mix → sequence packing

Each stage is one of the engine's existing operators (``operators.dedup``,
``operators.textstats``, ``operators.mixing``, ``operators.packing``); this
module wires them into a single lazily-composed plan (no checkpoint
between stages — the whole flow is narrow except the dedup hash-agg and
the packing range shuffle, so Catalyst pipelines it; checkpoint the OUTPUT
with the LinkagePipeline machinery when running it as a stage graph).

Every decision is deterministic and engine-portable, so the full flow is
DuckDB-oracle-checkable end-to-end (cu1_curation_pipeline): md5 min-id
dedup, integer/single-division quality thresholds, md5-bound sampling,
long prefix-sum packing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass as _dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from capelinker_spark.stage_runner import StageRunner

from capelinker_spark.operators.dedup import dedup_exact
from capelinker_spark.operators.mixing import sample_to_rates
from capelinker_spark.operators.packing import assign_packed_sequences
from capelinker_spark.operators.textstats import alpha_ratio, token_count_ws


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    min_alpha_ratio: float = 0.5,
    lang_rates: dict[str, float] | None = None,
    tokens_per_seq: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    token_counter: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Run the four-stage curation flow; returns the packed survivor table
    ``(doc_id, lang, n_tokens, seq_offset, seq_id)``.

    Stages:
    1. exact dedup — keep the min-id row per distinct text (md5);
    2. quality filter — ``n_tokens ≥ min_tokens`` and
       ``alpha_ratio > min_alpha_ratio`` (single int/int IEEE division);
    3. language mixing — per-language deterministic downsampling
       (``mixing.sample_to_rates``; None keeps every language whole);
    4. packing — assign survivors, in global ``id_col`` order, to
       ``tokens_per_seq``-token training windows (distributed prefix sum).

    ``token_counter`` sets the token unit for BOTH the ``min_tokens``
    quality gate and the packing budget (real pretraining windows are
    budgeted in tokenizer tokens, not whitespace words): any
    ``Column -> Column`` counter — ``textstats.token_count_bpe``, or an
    injected UDF wrapping a real tokenizer. Default: whitespace
    (``token_count_ws``). The counter must be deterministic for the
    pipeline to stay rerun-stable and oracle-checkable.
    """
    count = token_counter or token_count_ws
    c = F.col(text_col)
    deduped = dedup_exact(docs, text_col, id_col)
    scored = deduped.withColumn("n_tokens", count(c)).withColumn(
        "_alpha", alpha_ratio(c)
    )
    kept = scored.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("_alpha") > min_alpha_ratio)
    )
    if lang_rates:
        kept = sample_to_rates(kept, lang_col, lang_rates, id_col)
    packed = assign_packed_sequences(
        kept.select(id_col, lang_col, "n_tokens"),
        "n_tokens",
        id_col,
        tokens_per_seq,
    )
    return packed.select(id_col, lang_col, "n_tokens", "seq_offset", "seq_id")


def model_quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model=None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Model-based quality scoring — the classifier tier ABOVE the
    heuristic thresholds (the CCNet/FineWeb pattern: a linear model over
    cheap features replaces hand-tuned cutoffs): logistic over
    ``textstats.quality_features`` (alpha/digit/stopword ratios, mean
    token length), compiled to ONE native sigmoid expression by
    ``ml.logistic.LogisticModel`` — zero Python in the scoring path, same
    contract as pair scoring (M1).

    ``model=None`` uses pinned default weights (documented weak-label
    recipe: positives = heuristic-passing docs, negatives = word-shuffled
    text; retrain with ``ml.logistic.train_logistic`` on your corpus and
    pass the result). Returns ``(id, <features>, quality_prob)`` with the
    probability rounded to 6 decimals (the engine-portable convention:
    IEEE feature math is bit-identical, rounding absorbs exp() ulps).

    ``passthrough``: extra input columns carried into the output — a
    downstream stage that needs e.g. the text alongside the score should
    use this instead of re-joining on ``id_col`` (a self-join re-evaluates
    the whole upstream subtree — review finding r4)."""
    import numpy as np

    from capelinker_spark.ml.logistic import LogisticModel
    from capelinker_spark.operators.textstats import quality_features

    if model is None:
        model = LogisticModel(
            features=["alpha_ratio", "digit_ratio", "stopword_ratio",
                      "mean_token_len"],
            weights=np.array([3.0, -1.5, 2.0, 0.3]),
            bias=-0.5,
            means=np.array([0.6, 0.05, 0.1, 5.0]),
            stds=np.array([0.2, 0.08, 0.08, 2.0]),
        )
    feats = quality_features(F.col(text_col))
    base = docs.select(
        id_col,
        *passthrough,
        *[feats[f].alias(f) for f in model.features],
    )
    scored = model.transform(base, out="quality_prob")
    return scored.select(
        id_col,
        *passthrough,
        *model.features,
        F.round("quality_prob", 6).alias("quality_prob"),
    )


def apply_domain_policies(
    df: DataFrame,
    policies: dict[str, dict],
    domain_col: str = "domain",
    id_col: str = "doc_id",
    quality_col: str = "quality_prob",
    default_min_quality: float = 0.0,
    default_rate: float = 1.0,
    seed: str = "dom",
) -> DataFrame:
    """Per-domain curation policy — the FineWeb per-source recipe shape
    (round-4 verdict item 8): each registrable domain (``urls.
    registrable_domain``) may override the quality threshold and/or the
    keep rate; everything else (including NULL domains — non-URL rows)
    takes the defaults.

    ``policies``: ``{domain: {"min_quality_prob": q, "rate": r}}`` — a
    DRIVER-SIDE dict shipped as a broadcast literal table (config-sized,
    never a shuffle of the data side) and LEFT-joined on the domain, so
    the domain expression is evaluated ONCE per row. The first cut
    compiled the dict into CASE-over-literal expressions instead
    (``sample_to_rates`` style), but each CASE arm re-references the
    domain column and filter pushdown inlines the full nested-regexp
    domain parse into every reference — with 3 policies the fused stage
    blew past janino's 64 KB method limit and the whole query dropped
    out of whole-stage codegen. Unmatched (and NULL — non-URL) domains
    coalesce to the defaults. The threshold compares against the ROUNDED
    ``quality_col`` (the engine-portable convention) and the rate uses
    the md5-bound keep rule, so the gate is oracle-checkable end-to-end
    (the SQL mirror keeps the semantically-identical CASE form). The
    default ``seed`` is 'dom', DISTINCT from the empty-string seed of the
    downstream ``sample_to_rates``/``temperature_mix`` gates: a shared
    digest would make domain- and language-sampling perfectly correlated —
    composed keep = min(rates) over the SAME row subset instead of the
    product over independent subsets (round-5 review finding 2)."""
    from capelinker_spark.operators.mixing import _md5_bound, _md5_digest

    rows = [
        (
            dom,
            float(p.get("min_quality_prob", default_min_quality)),
            _md5_bound(float(p.get("rate", default_rate))),
        )
        for dom, p in sorted(policies.items())
    ]
    pol = df.sparkSession.createDataFrame(
        rows, f"{domain_col} string, _pol_thr double, _pol_bound string"
    )
    return (
        df.join(F.broadcast(pol), domain_col, "left")
        .where(
            (
                F.col(quality_col)
                >= F.coalesce(
                    F.col("_pol_thr"), F.lit(float(default_min_quality))
                )
            )
            & (
                _md5_digest(F.col(id_col), seed)
                < F.coalesce(
                    F.col("_pol_bound"), F.lit(_md5_bound(default_rate))
                )
            )
        )
        .drop("_pol_thr", "_pol_bound")
    )


def domain_policies_sql(
    policies: dict[str, dict],
    domain_col: str = "domain",
    id_col: str = "doc_id",
    quality_col: str = "quality_prob",
    default_min_quality: float = 0.0,
    default_rate: float = 1.0,
    seed: str = "dom",
) -> str:
    """DuckDB WHERE-clause mirror of ``apply_domain_policies`` (same CASE
    order, same md5 bounds — byte-for-byte)."""
    from capelinker_spark.operators.mixing import _md5_bound

    thr = repr(float(default_min_quality))
    bound = f"'{_md5_bound(default_rate)}'"
    for dom, p in sorted(policies.items()):
        q = float(p.get("min_quality_prob", default_min_quality))
        r = float(p.get("rate", default_rate))
        thr = f"CASE WHEN {domain_col} = '{dom}' THEN {q!r} ELSE {thr} END"
        bound = (
            f"CASE WHEN {domain_col} = '{dom}' THEN '{_md5_bound(r)}' "
            f"ELSE {bound} END"
        )
    return (
        f"({quality_col} >= ({thr}) AND "
        f"substr(md5('{seed}' || coalesce({id_col}::VARCHAR, '')), 1, 5) "
        f"< ({bound}))"
    )


@_dataclass
class CurationConfig:
    min_tokens: int = 10
    min_alpha_ratio: float = 0.5
    min_quality_prob: float = 0.0
    line_min_words: int = 5
    line_require_terminal: bool = True
    use_line_filter: bool = False
    lang_rates: dict | None = None
    temperature: float | None = None
    tokens_per_seq: int = 256
    token_unit: str = "ws"           # 'ws' | 'bpe'
    text_col: str = "text"
    id_col: str = "doc_id"
    lang_col: str = "lang"
    # per-domain policy (round-4 verdict item 8): when url_col is set, a
    # `domain` column (urls.registrable_domain) rides every stage and the
    # mixed stage applies apply_domain_policies(domain_policies) BEFORE
    # language mixing. Changing ONE domain's thresholds invalidates mixed+
    # packed but leaves cleaned/deduped/scored resumable (STAGE_DEPS).
    url_col: str | None = None
    domain_policies: dict | None = None
    # span/paragraph rewrite tiers (round-5 verdict item 5): optional
    # checkpointed stages AFTER the exact dedup — whole-document
    # identity collapses first (keep-one-copy), THEN cross-document
    # boilerplate is stripped with remove-every-copy semantics. The
    # other order would see an exact-duplicate pair as "every paragraph
    # shared by >=2 docs" and strip BOTH copies to empty. Each toggle
    # owns its stage's hash: flipping dedup_paragraphs re-runs
    # para_deduped + downstream, never cleaned/deduped.
    dedup_paragraphs: bool = False
    span_dedup_n: int | None = None


class CurationPipeline(StageRunner):
    """Checkpointed, resumable corpus curation — the curation analog of
    ``pipeline.LinkagePipeline``, on the SAME StageRunner machinery
    (chained config-hash ``_manifest.json`` per stage, schema/row-count
    validation, per-stage lineage rows with elapsed time and, for the
    scored stage, a quality-probability histogram):

        cleaned (line filter) → deduped (exact, on cleaned text) →
        scored (heuristics + model quality) → mixed (rates or
        temperature) → packed (token-budget windows)

    Changing ``min_quality_prob`` leaves cleaned/deduped/scored
    resumable; changing ``line_min_words`` recomputes everything — the
    manifest chain decides, never _SUCCESS alone. Each checkpoint is a
    parquet dir (the Iceberg-table stand-in; see pipeline.py header).
    """

    STAGE_DEPS = {
        # lang_col rides in the root stage's hash: every stage's output
        # carries the language column, so renaming it must invalidate the
        # whole chain (review finding r4 pass 2 — omitting it silently
        # resumed checkpoints built from the OLD column). url_col likewise:
        # it decides whether a domain column rides the chain.
        "cleaned": (
            ("use_line_filter", "line_min_words", "line_require_terminal",
             "text_col", "id_col", "lang_col", "url_col"),
            None,
        ),
        "deduped": ((), "cleaned"),
        # rewrite tiers chain AFTER the exact dedup (see the config-field
        # comment for why); each hashes only its own toggle, so
        # enabling/param-editing one invalidates it + downstream while
        # cleaned/deduped stay resumable
        "para_deduped": (("dedup_paragraphs",), "deduped"),
        "span_deduped": (("span_dedup_n",), "para_deduped"),
        "scored": (("token_unit",), "span_deduped"),
        # domain_policies sits HERE: editing one domain's thresholds
        # re-runs mixed+packed only, never the dedup/scoring upstream
        "mixed": (
            ("min_tokens", "min_alpha_ratio", "min_quality_prob",
             "lang_rates", "temperature", "domain_policies"),
            "scored",
        ),
        "packed": (("tokens_per_seq",), "mixed"),
    }

    def __init__(self, spark, workdir: str, config: CurationConfig | None = None):
        cfg = config or CurationConfig()
        if cfg.domain_policies and not cfg.url_col:
            raise ValueError(
                "domain_policies requires url_col (the domain column is "
                "derived from it)"
            )
        self._init_runner(spark, workdir, cfg)

    def run(self, docs: DataFrame, resume: bool = True) -> dict:
        from capelinker_spark.operators.mixing import temperature_mix
        from capelinker_spark.operators.textstats import (
            line_filter,
            token_count_bpe,
        )

        cfg = self.cfg
        counter = token_count_bpe if cfg.token_unit == "bpe" else token_count_ws

        # per-domain curation: derive the registrable domain ONCE at the
        # root (narrow expression over url_col) and let it ride every
        # stage's output — policies are applied in `mixed`
        dom_cols: list = []
        if cfg.url_col:
            from capelinker_spark.operators.urls import registrable_domain

            dom_cols = [
                registrable_domain(F.col(cfg.url_col)).alias("domain")
            ]

        def _cleaned():
            kept = line_filter(
                F.col(cfg.text_col), cfg.line_min_words,
                cfg.line_require_terminal,
            )
            return docs.select(
                cfg.id_col, kept.alias(cfg.text_col), cfg.lang_col, *dom_cols
            ).where(F.length(cfg.text_col) > 0)

        if cfg.use_line_filter:
            cleaned = self._stage("cleaned", _cleaned, resume)
        else:
            # no cleaning → no checkpoint: materializing an unmodified copy
            # of the corpus would double storage at scale. The manifest
            # chain still covers the choice (use_line_filter is in
            # cleaned's hash, which deduped's hash chains on).
            cleaned = docs.select(
                cfg.id_col, cfg.text_col, cfg.lang_col, *dom_cols
            )

        deduped = self._stage(
            "deduped",
            lambda: dedup_exact(cleaned, cfg.text_col, cfg.id_col),
            resume,
        )

        # optional rewrite tiers: paragraph-level then span-level
        # cross-document dedup, each re-emitting the corpus shape
        # (id, text, lang[, domain]) so downstream stages are agnostic
        # to whether a rewrite ran. Rewritten-to-empty docs drop (same
        # contract as the cleaned stage's length>0 filter).
        pt = (cfg.lang_col, *(("domain",) if dom_cols else ()))

        def _reshape(rw: DataFrame) -> DataFrame:
            return rw.select(
                cfg.id_col, F.col("clean_text").alias(cfg.text_col), *pt
            ).where(F.length(cfg.text_col) > 0)

        current = deduped
        para_deduped = span_deduped = None
        if cfg.dedup_paragraphs:
            from capelinker_spark.operators.dedup import (
                remove_duplicate_paragraphs,
            )

            upstream = current
            para_deduped = current = self._stage(
                "para_deduped",
                lambda: _reshape(
                    remove_duplicate_paragraphs(
                        upstream, cfg.text_col, cfg.id_col, passthrough=pt
                    )
                ),
                resume,
            )
        if cfg.span_dedup_n:
            from capelinker_spark.operators.dedup import (
                remove_duplicate_spans,
            )

            upstream2 = current
            span_deduped = current = self._stage(
                "span_deduped",
                lambda: _reshape(
                    remove_duplicate_spans(
                        upstream2, cfg.span_dedup_n, cfg.text_col,
                        cfg.id_col, passthrough=pt,
                    )
                ),
                resume,
            )

        def _scored():
            c = F.col(cfg.text_col)
            base = current.withColumn("n_tokens", counter(c)).withColumn(
                "alpha", alpha_ratio(c)
            )
            return model_quality_scores(
                base,
                text_col=cfg.text_col,
                id_col=cfg.id_col,
                passthrough=(cfg.lang_col, "n_tokens", "alpha",
                             *(["domain"] if dom_cols else [])),
            )

        scored = self._stage("scored", _scored, resume, score_col="quality_prob")

        def _mixed():
            kept = scored.where(
                (F.col("n_tokens") >= cfg.min_tokens)
                & (F.col("alpha") > cfg.min_alpha_ratio)
            )
            if cfg.domain_policies:
                # the domain policy OWNS the quality gate when configured:
                # applying the global min_quality_prob first would make a
                # per-domain threshold BELOW the global one unreachable
                # (round-5 review finding 1) — non-overridden domains
                # still get cfg.min_quality_prob as the default
                kept = apply_domain_policies(
                    kept, cfg.domain_policies, id_col=cfg.id_col,
                    default_min_quality=cfg.min_quality_prob,
                )
            else:
                kept = kept.where(
                    F.col("quality_prob") >= cfg.min_quality_prob
                )
            if cfg.lang_rates:
                kept = sample_to_rates(
                    kept, cfg.lang_col, cfg.lang_rates, cfg.id_col
                )
            elif cfg.temperature is not None:
                kept = temperature_mix(
                    kept, cfg.lang_col, cfg.id_col, cfg.temperature
                )
            return kept.select(cfg.id_col, cfg.lang_col, "n_tokens",
                               "quality_prob",
                               *(["domain"] if dom_cols else []))

        mixed = self._stage("mixed", _mixed, resume, key_metrics_col=cfg.lang_col)

        packed = self._stage(
            "packed",
            lambda: assign_packed_sequences(
                mixed, "n_tokens", cfg.id_col, cfg.tokens_per_seq
            ),
            resume,
        )
        out = {
            "cleaned": cleaned, "deduped": deduped, "scored": scored,
            "mixed": mixed, "packed": packed,
        }
        if para_deduped is not None:
            out["para_deduped"] = para_deduped
        if span_deduped is not None:
            out["span_deduped"] = span_deduped
        return out


def domain_rollup(
    df: DataFrame,
    domain_col: str = "domain",
    quality_col: str = "quality_prob",
    text_col: str = "text",
    low_quality: float = 0.5,
) -> DataFrame:
    """Per-domain corpus report — THE table a curation run hands back to
    its operators (which hosts dominate the corpus, which are low
    quality, where the bytes are; FineWeb/C4-style per-source triage):
    one row per registrable domain with document count, total characters,
    low-quality count, and mean model quality.

    Exactness: ``quality_col`` values are the 6-decimal-rounded model
    probabilities (cu3 convention), re-quantized to LONG micro-units via
    ``floor(q·1e6 + 0.5)`` — the floor form, NOT round(,6), per the f16
    half-boundary rule — so the per-domain sum is exact integer
    arithmetic under any aggregation order, and ``mean_quality`` is ONE
    final IEEE division ``sum_q6 / (n_docs · 1e6)``. The low-quality
    threshold filters on the ROUNDED value (repo convention). NULL
    quality counts as neither low nor into the mean's numerator (but is
    in ``n_docs``); NULL text contributes 0 chars.

    Plan: a single map-side-combinable hash aggregation — one shuffle of
    #domains-sized partials, no joins, no Python."""
    q = F.col(quality_col)
    q6 = F.floor(q * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        df.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.coalesce(F.length(F.col(text_col)), F.lit(0)).cast("long")
            ).alias("total_chars"),
            F.sum(
                F.when(q < F.lit(float(low_quality)), F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("n_low_quality"),
            F.sum(q6).alias("_q6"),
        )
        .select(
            domain_col,
            "n_docs",
            "total_chars",
            "n_low_quality",
            (
                F.col("_q6") / (F.col("n_docs") * F.lit(1000000.0))
            ).alias("mean_quality"),
        )
    )
