"""Deterministic synthetic corpus: CC-style pages embedding household records.

The graft input (BASELINE.json input_hint) is an Iceberg/parquet table of
web pages ``(url, warc_ts, html, text, lang)``. This module generates such a
table, seeded and pure-deterministic, with one Cape-opgaafrollen-style
household record embedded per page (labeled lines in ``text``), plus the
hidden ground-truth entity id per page for cluster-F1 scoring.

Generator design follows the reference's own synthetic-string recipe
``rand_strings_like`` (R/util.R:217-229) in spirit — names drawn from an
empirical pool with Zipf-ish weights (frequent surnames create the key skew
the blocking layer must handle) — and the noise model mirrors the data
problems the reference cleaning chain exists to fix
(data_raw/traindata_graafreinet.R:40-96: junk suffixes, empty strings, 'X'
placeholders, stray whitespace, diacritics, spelling drift).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SURNAME_POOL = [
    # weights fall off Zipf-ish; BOTHA is the deliberate mega-block (skew)
    "BOTHA", "VAN DER MERWE", "DU PLESSIS", "COETZEE", "VAN WYK", "JOUBERT",
    "NEL", "FOURIE", "DU TOIT", "PRETORIUS", "VENTER", "SMIT", "KRUGER",
    "DE VILLIERS", "VAN NIEKERK", "STEYN", "MARAIS", "VILJOEN", "SWANEPOEL",
    "LE ROUX", "THERON", "ERASMUS", "BEZUIDENHOUT", "MEYER", "FERREIRA",
    "BARNARD", "VAN ZYL", "OLIVIER", "MULLER", "LOUW", "STRYDOM", "JORDAAN",
    "VERMEULEN", "POTGIETER", "LABUSCHAGNE", "ENGELBRECHT", "ROSSOUW",
    "MOSTERT", "CRONJE", "LOMBARD", "VISAGIE", "SCHOEMAN", "BRITS",
    "ACKERMAN", "ODENDAAL", "GROBLER", "MALAN", "NAUDE", "BRINK", "CILLIERS",
    "DE KLERK", "HUGO", "KOTZE", "LOTTER", "OOSTHUIZEN", "PIENAAR",
    "RAUTENBACH", "SNYMAN", "TRUTER", "UYS", "WESSELS", "ZIETSMAN",
]

MFIRST_POOL = [
    "JOHANNES", "JACOBUS", "WILLEM", "HENDRIK", "PIETER", "GERT", "FREDERIK",
    "CHRISTIAAN", "DANIEL", "STEPHANUS", "ANDRIES", "CORNELIS", "MARTHINUS",
    "NICOLAAS", "PHILIPPUS", "GIDEON", "BAREND", "LODEWYK", "ADRIAAN",
    "THEUNIS", "OCKERT", "RUDOLPH", "SAREL", "TOBIAS", "WYNAND", "IZAK",
    "ALBERTUS", "DIRK", "ERNST", "FRANS",
]

WFIRST_POOL = [
    "MARIA", "ANNA", "JOHANNA", "SUSANNA", "ELIZABETH", "CATHARINA",
    "MAGDALENA", "HESTER", "ALETTA", "MARTHA", "JACOBA", "SARA", "CORNELIA",
    "GEERTRUIDA", "HELENA", "WILHELMINA", "ENGELA", "PETRONELLA", "RACHEL",
    "DOROTHEA", "LEVINA", "FRANCINA", "GESINA", "HENDRINA", "LOUISA",
]

DISTRICTS = ["graaff-reinet", "stellenbosch", "swellendam", "tulbagh", "uitenhage"]

JUNK_SUFFIXES = [" (WED)", "/JR", "?", " 1822", "&Z", " (NO SURNAME)"]

PAGE_TEMPLATE = (
    "OPGAAFROL CENSUS RETURN\n"
    "YEAR: {year}\n"
    "DISTRICT: {district}\n"
    "MAN SURNAME: {mlast}\n"
    "MAN FIRSTNAME: {mfirst}\n"
    "WIFE SURNAME: {wlast}\n"
    "WIFE FIRSTNAME: {wfirst}\n"
    "CHILDREN: {children}\n"
    "CATTLE: {cattle}\n"
    "SHEEP: {sheep}\n"
    "HORSES: {horses}\n"
)

HTML_TEMPLATE = (
    "<!DOCTYPE html><html><head><title>Opgaafrol {year} {district}</title>"
    "</head><body><pre>\n{text}</pre></body></html>"
)

_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _edit(rng: np.random.Generator, s: str) -> str:
    """One random char edit at position ≥1 (keeps the first letter, so the
    noise stays within what first-letter/soundex blocking can absorb)."""
    if len(s) < 3:
        return s
    pos = int(rng.integers(1, len(s)))
    op = int(rng.integers(0, 3))
    c = _LETTERS[int(rng.integers(0, 26))]
    if op == 0:  # substitute
        return s[:pos] + c + s[pos + 1:]
    if op == 1:  # delete
        return s[:pos] + s[pos + 1:]
    return s[:pos] + c + s[pos:]  # insert


def _noisy_name(rng: np.random.Generator, s: str | None) -> str | None:
    """Apply the fixture noise model to one name field."""
    if s is None:
        return None
    r = rng.random()
    if r < 0.03:
        return ""
    if r < 0.05:
        return "X"
    out = s
    if rng.random() < 0.30:
        out = _edit(rng, out)
    if rng.random() < 0.12:
        out = out[:-1] if out.endswith("H") else out + "H"
    if rng.random() < 0.08:
        pos = int(rng.integers(1, max(2, len(out))))
        out = out[:pos] + out[pos - 1] + out[pos:]  # double a letter
    if rng.random() < 0.08:
        out = out + JUNK_SUFFIXES[int(rng.integers(0, len(JUNK_SUFFIXES)))]
    if rng.random() < 0.05:
        out = " " + out if rng.random() < 0.5 else out + " "
    if rng.random() < 0.03 and "E" in out[1:]:
        i = out.index("E", 1)
        out = out[:i] + ("é" if rng.random() < 0.5 else "ë") + out[i + 1:]
    return out


def make_corpus(
    n_entities: int = 500,
    years: tuple[int, ...] = (1826, 1828),
    seed: int = 42,
    appear_prob: float = 0.85,
) -> dict[str, pd.DataFrame]:
    """Build the synthetic corpus.

    Returns ``{"pages": ..., "truth": ...}`` where pages has the graft input
    schema ``(url, warc_ts, html, text, lang)`` and truth maps
    ``(url, persid, entity_id, year)`` plus the clean (pre-noise) name fields.
    """
    rng = np.random.default_rng(seed)
    sw = _zipf_weights(len(SURNAME_POOL), 0.95)
    mw = _zipf_weights(len(MFIRST_POOL), 0.8)
    ww = _zipf_weights(len(WFIRST_POOL), 0.8)

    entities = []
    for eid in range(n_entities):
        mlast = SURNAME_POOL[int(rng.choice(len(SURNAME_POOL), p=sw))]
        mfirst = MFIRST_POOL[int(rng.choice(len(MFIRST_POOL), p=mw))]
        if rng.random() < 0.75:
            mfirst += " " + MFIRST_POOL[int(rng.choice(len(MFIRST_POOL), p=mw))]
        has_wife = rng.random() < 0.9
        wlast = (
            SURNAME_POOL[int(rng.choice(len(SURNAME_POOL), p=sw))]
            if has_wife
            else None
        )
        wfirst = (
            WFIRST_POOL[int(rng.choice(len(WFIRST_POOL), p=ww))]
            + (
                " " + WFIRST_POOL[int(rng.choice(len(WFIRST_POOL), p=ww))]
                if rng.random() < 0.4
                else ""
            )
            if has_wife
            else None
        )
        entities.append(
            {
                "entity_id": eid,
                "mlast": mlast,
                "mfirst": mfirst,
                "wlast": wlast,
                "wfirst": wfirst,
                "district": DISTRICTS[int(rng.integers(0, len(DISTRICTS)))],
                "children": int(rng.poisson(3)),
                "cattle": int(rng.integers(0, 200)),
                "sheep": int(rng.integers(0, 1000)),
                "horses": int(rng.integers(0, 30)),
            }
        )

    rows = []
    persid = 0
    for ent in entities:
        appear_years = [y for y in years if rng.random() < appear_prob]
        if not appear_years:
            appear_years = [years[0]]
        for k, year in enumerate(appear_years):
            persid += 1
            clean = k == 0 and rng.random() < 0.5  # first obs often clean
            def field(v):
                if v is None:
                    return None
                return v if clean else _noisy_name(rng, v)

            mlast_n = field(ent["mlast"])
            mfirst_n = field(ent["mfirst"])
            wife_missing = rng.random() < 0.08
            wlast_n = None if wife_missing else field(ent["wlast"])
            wfirst_n = None if wife_missing else field(ent["wfirst"])

            def num(v, miss=0.05, drift=0.12):
                if rng.random() < miss:
                    return "."
                return str(max(0, int(v * (1 + rng.normal(0, drift)))))

            text = PAGE_TEMPLATE.format(
                year=year,
                district=ent["district"],
                mlast=mlast_n if mlast_n is not None else "",
                mfirst=mfirst_n if mfirst_n is not None else "",
                wlast=wlast_n if wlast_n is not None else "",
                wfirst=wfirst_n if wfirst_n is not None else "",
                children=num(ent["children"], drift=0.1),
                cattle=num(ent["cattle"]),
                sheep=num(ent["sheep"]),
                horses=num(ent["horses"]),
            )
            url = f"https://opgaaf-{ent['district']}.example/{year}/{persid:08d}"
            rows.append(
                {
                    "url": url,
                    "warc_ts": datetime(2013, 1, 1) + timedelta(minutes=persid),
                    "html": HTML_TEMPLATE.format(
                        year=year, district=ent["district"], text=text
                    ).encode("utf-8"),
                    "text": text,
                    "lang": ["af", "nl", "en"][int(rng.choice(3, p=[0.5, 0.3, 0.2]))],
                    "persid": persid,
                    "entity_id": ent["entity_id"],
                    "year": year,
                }
            )

    pdf = pd.DataFrame(rows)
    pages = pdf[["url", "warc_ts", "html", "text", "lang"]].copy()
    truth = pdf[["url", "persid", "entity_id", "year"]].copy()
    return {"pages": pages, "truth": truth}


def rand_strings_like(
    strings_like: list[str], n_samples: int = 1, seed: int = 42
) -> list[str]:
    """Random strings with the empirical char distribution and Normal(μ,σ)
    length of the input pool — the reference's own synthetic-string recipe
    (``rand_strings_like``, R/util.R:217-229), transcribed for the seeded
    numpy generator."""
    rng = np.random.default_rng(seed)
    chars: dict[str, int] = {}
    for s in strings_like:
        for c in s:
            chars[c] = chars.get(c, 0) + 1
    alphabet = list(chars)
    weights = np.array([chars[c] for c in alphabet], dtype="float64")
    weights /= weights.sum()
    lengths = np.array([len(s) for s in strings_like], dtype="float64")
    mu, sigma = lengths.mean(), lengths.std(ddof=1) if len(lengths) > 1 else 1.0
    out = []
    for _ in range(n_samples):
        n = max(1, abs(int(round(rng.normal(mu, sigma)))))
        out.append("".join(rng.choice(alphabet, size=n, p=weights)))
    return out


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, pages_pdf: pd.DataFrame):
    """Spark DataFrame with the graft input schema."""
    return spark.createDataFrame(pages_pdf, schema=PAGES_SCHEMA)


def truth_df(spark, truth_pdf: pd.DataFrame):
    return spark.createDataFrame(
        truth_pdf, schema="url string, persid long, entity_id long, year int"
    )
