"""Name/string normalization — the reference "extractor" chain, as native exprs.

Every function here is a pure JVM-side column expression (codegen'd, no
Python). Each mirrors one step of the reference cleaning chain; the byte-level
contract is locked by tests against ``capelinker_spark.ref_extract`` (a plain
Python transcription of the reference semantics) on fixture pages.

Reference steps mirrored (see SURVEY.md §2.2/§2.5):

* ``rm_diacretics`` — fixed 13-char map, ``R/util.R:203-208``.
* analphabetic truncation ``[^A-Z .].* → ''`` —
  ``data_raw/traindata_graafreinet.R:68-78``.
* trim — ``stri_trim_both``, ``data_raw/traindata_graafreinet.R:83-86``.
* empty→NULL — ``data_raw/traindata_graafreinet.R:48-51``.
* placeholder "X"→NULL — ``data_raw/traindata_graafreinet.R:93-96``.
* ``initials`` — ``R/util.R:121-137`` (NB the ``[A-z]`` character class,
  which includes ``[\\]^_`` and backtick, is replicated exactly).
* ``split_prefixes`` — 27-entry surname-particle list, longest-first,
  case-insensitive, ``R/util.R:60-106``.
* ``len_longest_word`` — ``R/util.R:313-318``.
* name concatenation with NA guards — ``data_raw/data_capetown.R:20-26``,
  ``data_raw/traindata_graafreinet.R:110``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed diacritic map, R/util.R:204-207
DIACRITICS_FROM = "éëêèâáàåüûîïç"
DIACRITICS_TO = "eeeeaaaauuiic"

# surname particles, R/util.R:62-90 (order as listed; duplicates deduped
# keeping first occurrence, then sorted longest-first — R/util.R:92-93)
PREFIXES = [
    "AN", "DA", "DE LA", "DE", "DES", "DER", "DIE", "DU", "LA", "LE",
    "OVER", "PU", "TE", "TEN", "TER", "V D", "VAN DE", "VAN DEN",
    "VAN DER", "VAN DER", "VAN", "VAN[.]", "VAND DER", "VANN DER",
    "VD", "VEN", "VNA DEN", "VON",
]


def prefix_pattern(more_prefixes: list[str] | None = None) -> str:
    """The alternation regex of R/util.R:91-94: ``^{p} `` joined by ``|``,
    unique-keeping-first, stable-sorted longest-first, case-insensitive
    (caller adds the flag)."""
    prefixes = list(PREFIXES) + list(more_prefixes or [])
    seen: dict[str, None] = {}
    for p in prefixes:
        seen.setdefault(p, None)
    ordered = sorted(seen.keys(), key=lambda s: -len(s))  # stable, like order(-nchar)
    return "|".join(f"^{p} " for p in ordered)


# the initials pattern of R/util.R:124 — [A-z] quirk preserved
INITIALS_PATTERN = r"^[A-z]|\s[A-z]|[.][A-z]"


# the reference's observed mojibake bytes → letters
# (data_raw/traindata_graafreinet.R:29-31: \x86→U, \x83→E)
MOJIBAKE_MAP = {"\x86": "U", "\x83": "E"}


def fix_mojibake(col: Column) -> Column:
    """Byte-level fixups of known bad OCR/encoding bytes (P7,
    data_raw/traindata_graafreinet.R:28-31) — native translate."""
    return F.translate(
        col, "".join(MOJIBAKE_MAP.keys()), "".join(MOJIBAKE_MAP.values())
    )


def rm_diacretics(col: Column) -> Column:
    """Fixed-map diacritic folding (R/util.R:203-208) — native ``translate``."""
    return F.translate(col, DIACRITICS_FROM, DIACRITICS_TO)


def strip_analphabetics(col: Column) -> Column:
    """Truncate at the first char outside ``[A-Z .]``
    (``stri_replace_all_regex(x, "[^A-Z .].*", "")``,
    data_raw/traindata_graafreinet.R:68-71)."""
    return F.regexp_replace(col, r"[^A-Z .].*", "")


def empty_to_null(col: Column) -> Column:
    """'' → NULL (data_raw/traindata_graafreinet.R:48-51)."""
    return F.nullif(col, F.lit(""))


def placeholder_to_null(col: Column, placeholder: str = "X") -> Column:
    """Single-char placeholder → NULL (data_raw/traindata_graafreinet.R:93-96)."""
    return F.nullif(col, F.lit(placeholder))


def clean_name(col: Column) -> Column:
    """The full per-name cleaning chain (uppercase source convention), in the
    REFERENCE's order (data_raw/traindata_graafreinet.R:48-96):
    diacritic fold → ''→NULL → analphabetic truncation → trim → 'X'→NULL.

    NB the ''→NULL pass runs BEFORE truncation (R:48-51 precede R:68-71), so
    a name emptied BY truncation/trim stays '' — exactly as in R, where such
    values remain "" and still participate in string comparisons. Round 1
    applied ''→NULL last; that deviation is now removed."""
    c = rm_diacretics(col)
    c = empty_to_null(c)
    c = strip_analphabetics(c)
    c = F.trim(c)
    return placeholder_to_null(c)


def initials(col: Column) -> Column:
    """Initials in the form "JF" (R/util.R:121-137).

    Extract all matches of ``^[A-z]|\\s[A-z]|[.][A-z]``, strip ``[ .]`` from
    each, join. No match → '' (the return_NA_on_empty=FALSE default used by
    the training chain, data_raw/traindata_graafreinet.R:101-102). NULL → NULL.
    """
    matches = F.regexp_extract_all(col, F.lit(INITIALS_PATTERN), F.lit(0))
    stripped = F.transform(matches, lambda m: F.regexp_replace(m, r"[ .]", ""))
    return F.array_join(stripped, "")


def split_prefix(col: Column, more_prefixes: list[str] | None = None) -> tuple[Column, Column]:
    """(prefix, string_wo_prefix) per R/util.R:97-105.

    prefix includes the trailing space (e.g. 'VAN DER '); no match → NULL
    prefix and the unchanged string (stri_extract_first_regex returns NA).
    """
    pat = prefix_pattern(more_prefixes)
    extracted = F.regexp_extract(col, f"(?i)({pat})", 1)
    prefix = F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.nullif(extracted, F.lit(""))
    )
    wo = F.regexp_replace(col, f"(?i)(?:{pat})", "")
    return prefix, wo


def len_longest_word(col: Column) -> Column:
    """Length of the longest ``[A-Za-z]+`` token (R/util.R:313-318).

    No token → NULL (R's max over empty gives -Inf with a warning; we emit
    NULL and document the deviation).
    """
    toks = F.regexp_extract_all(col, F.lit("[A-Za-z]+"), F.lit(0))
    return F.array_max(F.transform(toks, F.length))


def is_initials_only(col: Column) -> Column:
    """``wfirst_is_initials`` feature: longest word has length 1
    (data_raw/pretrained.R:396-397)."""
    return (len_longest_word(col) == 1).cast("double")


def concat_names(first: Column, second: Column, sep: str = " ") -> Column:
    """NA-guarded name concatenation (data_raw/data_capetown.R:20-26):
    R ``paste`` renders NA as the literal 'NA'; the reference guards by
    substituting '' first — we use coalesce-to-'' + trim, which matches the
    guarded behaviour."""
    return F.trim(
        F.concat_ws(sep, F.coalesce(first, F.lit("")), F.coalesce(second, F.lit("")))
    )
