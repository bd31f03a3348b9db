"""Byte-identity test: the Spark-native extractor output per url must equal
the plain-Python reference chain (capelinker_spark.ref_extract) byte-for-byte
on every string field — the graft's per-row invariant (BASELINE.json)."""

from __future__ import annotations

import math

from capelinker_spark import ref_extract as R
from capelinker_spark.extract import extract_records
from capelinker_spark.functions.strdist import jaro_winkler_dist

STRING_FIELDS = [
    "mlast", "mfirst", "wlast", "wfirst",
    "minitials", "winitials",
    "mprefix", "mlast_woprefix", "wprefix", "wlast_woprefix",
    "mfullname", "district",
]
NUM_FIELDS = ["settlerchildren", "cattle", "sheep", "horses"]


def test_extract_byte_identity(spark, pages, corpus):
    got = {r["url"]: r.asDict() for r in extract_records(pages).collect()}
    assert len(got) == len(corpus["pages"])

    checked_nonnull = 0
    for _, page in corpus["pages"].iterrows():
        url = page["url"]
        expected = R.normalize_record(R.extract_record(page["text"]))
        actual = got[url]
        for f in STRING_FIELDS:
            ev = expected.get(f if f != "district" else "district")
            assert actual[f] == ev, (url, f, actual[f], ev)
            if ev is not None:
                checked_nonnull += 1
        assert actual["year"] == expected["year"], url
        assert actual["wifepresent"] == expected["wifepresent"], url
        for f in NUM_FIELDS:
            ev = expected[f]
            if ev is None:
                assert actual[f] is None, (url, f)
            else:
                assert actual[f] == ev, (url, f)
        # spousenamedist: UDF path vs pure kernel
        ev = jaro_winkler_dist(expected["mlast"], expected["wlast"], p=0.1)
        av = actual["spousenamedist"]
        if ev is None:
            assert av is None, (url, "spousenamedist")
        else:
            assert math.isclose(av, ev, abs_tol=1e-12), (url, "spousenamedist")

    assert checked_nonnull > 1000  # the invariant is exercised, not vacuous


def test_extract_handles_html_passthrough(spark, pages):
    """The html binary column is available but untouched (opaque payload)."""
    df = extract_records(pages, with_spousenamedist=False)
    assert "html" not in df.columns
    assert df.count() == pages.count()


def test_record_id_deterministic(spark, pages):
    a = {r["url"]: r["persid"] for r in extract_records(pages, False).select("url", "persid").collect()}
    b = {r["url"]: r["persid"] for r in extract_records(pages.repartition(7), False).select("url", "persid").collect()}
    assert a == b
    assert len(set(a.values())) == len(a)  # unique ids
