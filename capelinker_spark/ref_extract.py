"""Plain-Python transcription of the reference extractor chain (the oracle).

This module is the byte-level SPEC: it re-implements, in pure Python over
plain strings, exactly what the reference R cleaning chain does
(data_raw/traindata_graafreinet.R:40-110, R/util.R:60-137,203-208). The
Spark-native expressions in ``capelinker_spark.functions.normalize`` and the
page extractor in ``capelinker_spark.extract`` are tested to produce
byte-identical output per url against this module (the graft's per-row
invariant, BASELINE.json input_hint).

Never used on executors — driver/test-side only.
"""

from __future__ import annotations

import re

from capelinker_spark.functions.normalize import (
    DIACRITICS_FROM,
    DIACRITICS_TO,
    INITIALS_PATTERN,
    prefix_pattern,
)

_DIA = str.maketrans(DIACRITICS_FROM, DIACRITICS_TO)
_ANALPHA = re.compile(r"[^A-Z .].*")
_INITIALS = re.compile(INITIALS_PATTERN)
_PREFIX = re.compile(f"({prefix_pattern()})", re.IGNORECASE)


def rm_diacretics(s: str | None) -> str | None:
    """R/util.R:203-208."""
    return None if s is None else s.translate(_DIA)


def strip_analphabetics(s: str | None) -> str | None:
    """data_raw/traindata_graafreinet.R:68-71."""
    return None if s is None else _ANALPHA.sub("", s)


def clean_name(s: str | None) -> str | None:
    """Full chain in the reference's order: diacritics → ''→None → truncate
    analphabetics → trim → 'X'→None (data_raw/traindata_graafreinet.R:48-96).
    A name emptied BY truncation/trim stays '' (R keeps "" there)."""
    if s is None:
        return None
    s = rm_diacretics(s)
    if s == "":
        return None
    s = strip_analphabetics(s)
    s = s.strip()
    if s == "X":
        return None
    return s


def initials(s: str | None) -> str | None:
    """R/util.R:121-137, return_NA_on_empty=FALSE. NULL → NULL."""
    if s is None:
        return None
    matches = _INITIALS.findall(s)
    return "".join(m.replace(" ", "").replace(".", "") for m in matches)


def split_prefix(s: str | None) -> tuple[str | None, str | None]:
    """R/util.R:97-105: (prefix-with-trailing-space | None, string_wo_prefix)."""
    if s is None:
        return None, None
    m = _PREFIX.search(s)
    if m and m.start() == 0:
        return m.group(1), s[m.end():]
    return None, s


def concat_names(first: str | None, second: str | None) -> str:
    """NA-guarded paste (data_raw/data_capetown.R:20-26)."""
    return " ".join(x for x in (first or "", second or "") if True).strip()


def _line(text: str, label: str) -> str | None:
    """Capture ``^{label}: (.*)$`` (multiline), '' → None — the exact parse
    the Spark extractor performs (capelinker_spark.extract._line)."""
    m = re.search(f"(?m)^{re.escape(label)}: (.*)$", text)
    if m is None or m.group(1) == "":
        return None
    return m.group(1)


def extract_record(text: str) -> dict[str, object]:
    """Parse one fixture page's text into raw record fields.

    Page layout is defined by ``capelinker_spark.fixtures`` (labeled lines).
    Returns the RAW field values; apply ``clean_name`` etc. for the
    normalized record.
    """

    def _num(k: str) -> float | None:
        v = _line(text, k)
        if v is None or v == ".":
            return None
        return float(v)

    year = _line(text, "YEAR")
    return {
        "year": int(year) if year is not None else None,
        "district": _line(text, "DISTRICT"),
        "mlast_raw": _line(text, "MAN SURNAME"),
        "mfirst_raw": _line(text, "MAN FIRSTNAME"),
        "wlast_raw": _line(text, "WIFE SURNAME"),
        "wfirst_raw": _line(text, "WIFE FIRSTNAME"),
        "settlerchildren": _num("CHILDREN"),
        "cattle": _num("CATTLE"),
        "sheep": _num("SHEEP"),
        "horses": _num("HORSES"),
    }


def normalize_record(raw: dict[str, object]) -> dict[str, object]:
    """The full reference normalization over one raw record
    (traindata_graafreinet.R:40-110 order)."""
    mlast = clean_name(raw["mlast_raw"])
    mfirst = clean_name(raw["mfirst_raw"])
    wlast = clean_name(raw["wlast_raw"])
    wfirst = clean_name(raw["wfirst_raw"])
    mprefix, mlast_woprefix = split_prefix(mlast)
    wprefix, wlast_woprefix = split_prefix(wlast)
    return {
        "year": raw["year"],
        "district": raw["district"],
        "mlast": mlast,
        "mfirst": mfirst,
        "wlast": wlast,
        "wfirst": wfirst,
        "minitials": initials(mfirst),
        "winitials": initials(wfirst),
        "mprefix": mprefix,
        "mlast_woprefix": mlast_woprefix,
        "wprefix": wprefix,
        "wlast_woprefix": wlast_woprefix,
        "mfullname": concat_names(mlast, mfirst),
        "wifepresent": not (wfirst is None and wlast is None),
        "settlerchildren": raw["settlerchildren"],
        "cattle": raw["cattle"],
        "sheep": raw["sheep"],
        "horses": raw["horses"],
    }
