"""Corpus-trained BPE tokenizer: the step between `token_count_bpe`'s
regex APPROXIMATION and a real subword vocabulary — train byte-pair-merge
rules on the corpus, then encode/count with them.

Spark-first split of the classic algorithm (Sennrich et al. 2016):

* the UNBOUNDED part — pre-tokenized word frequencies over the corpus —
  is one explode + hash-aggregation (map-side combinable, the only
  shuffle);
* the BOUNDED part — iterative pair merges — runs on the driver over the
  top-``max_words`` word-count table (the same count-guarded-collect
  discipline as ``features.uniformise_strings(method='greedy_global')``):
  BPE merge selection needs global argmax per iteration, which is
  inherently sequential, but its input is a vocabulary histogram, not the
  corpus;
* encoding with the learned merges is an Arrow-batched pandas UDF
  (dict-driven merge loop per word, cached per distinct word within a
  batch) — the documented slow path, used only where subword IDs are
  actually needed; counting alone can stay native via
  ``token_count_bpe`` when the approximation suffices.

Determinism: merge selection breaks count ties on the lexicographically
smallest pair, so the same corpus always yields the same merge list —
rerun-stable and partitioning-independent (asserted in tests).

Reference has no tokenizer (text linkage only); this is part of the
task-mandate training-data surface (SURVEY §2-beyond).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas-UDF type hints resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from capelinker_spark.operators.textstats import BPE_ISH_PATTERN


def word_counts(
    docs: DataFrame, text_col: str = "text", pattern: str = BPE_ISH_PATTERN
) -> DataFrame:
    """Corpus word-frequency table ``(word, n)`` over the BPE-ish
    pre-tokenization (letter runs / digit runs / single punctuation).
    One explode + one combinable hash-agg — the only distributed stage
    of BPE training."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


END = "</w>"  # end-of-word sentinel symbol


def _merge_word(
    sym: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Greedy left-to-right replacement of ``pair`` in one symbol
    sequence — the single definition both trainers share, so the fast
    trainer is byte-identical to the naive one by construction."""
    a, b = pair
    merged = a + b
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _collect_vocab(
    wc: DataFrame, max_words: int
) -> dict[tuple[str, ...], int]:
    """Top-``max_words`` word histogram → symbol-sequence counts."""
    # unconditional TakeOrdered: limit-of-a-smaller-set is a no-op, and
    # gating it on an eager wc.count() would cost a full extra pass over
    # the count table (round-5 review finding 6)
    rows = wc.orderBy(F.desc("n"), "word").limit(max_words).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (END,)
        vocab[sym] = vocab.get(sym, 0) + int(r["n"])
    return vocab


def train_bpe(
    wc: DataFrame,
    num_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` byte-pair merges from a ``(word, n)`` count
    table. Driver-side over the top-``max_words`` most frequent words
    (count-guarded: an oversized vocabulary deterministically truncates
    to the most frequent entries — count desc, then word — rather than
    collecting unbounded). Ties on pair count break on the smallest
    pair — fully deterministic.

    Incremental trainer (round-5 verdict item 3): instead of recounting
    every pair over the whole vocabulary per merge (O(num_merges ×
    vocab × word_len) — hours at a production 32k-merge vocabulary),
    pair counts are maintained across merges. Each merge only touches
    the words that actually contain the merged pair (an inverted
    pair→word index), applying the old-pairs/new-pairs count delta per
    rewritten word. The argmax is a lazy max-heap keyed ``(-count,
    pair)`` — the exact naive tie-break order — with stale entries
    re-pushed at their current count on pop, so the heap top is always
    the true deterministic argmax. Byte-identical merge lists to the
    naive reference (``_train_bpe_naive``, regression-tested on a
    shared prefix); ~O(total affected symbols) instead of a full
    rescan, which takes 8k merges over a 100k-word vocab from hours to
    seconds.

    Returns the ordered merge list ``[(left, right), ...]``; feed it to
    ``make_bpe_encoder`` / ``bpe_token_count``."""
    import heapq
    from collections import Counter

    vocab = _collect_vocab(wc, max_words)
    # unique word states; equal-after-merge states may coexist as
    # separate entries — pair counting is additive, so the counts (and
    # therefore the merges) are identical to the naive dict-collapsing
    # form
    words: list[list] = [[sym, n] for sym, n in vocab.items()]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, n) in enumerate(words):
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(wi)

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heap[0]
        cur = pair_counts.get(best, 0)
        if cur != -negc:
            # stale entry: drop it and re-arm the pair at its current
            # count (keeps the invariant that every live pair has an
            # entry at >= its true count)
            heapq.heappop(heap)
            if cur > 0:
                heapq.heappush(heap, (-cur, best))
            continue
        if cur < 2:
            break
        heapq.heappop(heap)
        merges.append(best)
        del pair_counts[best]  # every occurrence merges below → 0

        for wi in sorted(pair_words.pop(best, ())):
            sym, n = words[wi]
            new = _merge_word(sym, best)
            if new == sym:  # stale index entry (pair vanished earlier)
                continue
            old_p = Counter(zip(sym, sym[1:]))
            new_p = Counter(zip(new, new[1:]))
            for q, k in (old_p - new_p).items():
                if q == best:
                    continue  # deleted wholesale above
                left = pair_counts.get(q, 0) - k * n
                if left > 0:
                    pair_counts[q] = left
                else:
                    pair_counts.pop(q, None)
            for q, k in (new_p - old_p).items():
                c = pair_counts.get(q, 0) + k * n
                pair_counts[q] = c
                pair_words.setdefault(q, set()).add(wi)
                heapq.heappush(heap, (-c, q))
            words[wi][0] = new
    return merges


def _train_bpe_naive(
    wc: DataFrame,
    num_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Reference trainer: full pair recount per merge (the round-4
    form). O(num_merges × vocab × word_len) — kept as the regression
    oracle for ``train_bpe``'s incremental bookkeeping, not for
    production use."""
    vocab = _collect_vocab(wc, max_words)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # deterministic argmax: max count, then smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = _merge_word(sym, best)
            new_vocab[out] = new_vocab.get(out, 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def make_bpe_encoder(merges: list[tuple[str, str]], pattern: str = BPE_ISH_PATTERN):
    """Build an Arrow-batched encoder ``Column -> Column`` producing
    ``array<string>`` subword tokens. The merge ranks ride the UDF
    closure (config-sized, serialized once per executor); per-batch a
    distinct-word cache makes the merge loop run once per unique word,
    not once per occurrence (heavy-tail word distributions make this the
    dominant saving)."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}
    rx = _re.compile(pattern)

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(t):
            if t is None:
                return None
            out: list[str] = []
            for w in rx.findall(t):
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(enc)

    return lambda col: _enc(col)


def bpe_token_count(merges: list[tuple[str, str]], pattern: str = BPE_ISH_PATTERN):
    """``Column -> Column`` trained-tokenizer token counter — pluggable
    into ``curate_corpus(token_counter=...)`` so quality gates and
    packing windows are budgeted in REAL learned-subword units."""
    enc = make_bpe_encoder(merges, pattern)
    # NULL text → NULL count (matching token_count_ws/bpe); empty → 0
    return lambda col: F.size(enc(col)).cast("int")
