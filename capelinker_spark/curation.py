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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
