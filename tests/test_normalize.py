"""Golden vectors for the normalization chain, from the reference's own
runnable examples (R/util.R:56-58, 118-119, 199-200)."""

from __future__ import annotations

from pyspark.sql import functions as F

from capelinker_spark.functions import normalize as N
from capelinker_spark import ref_extract as R


def _run1(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r["out"] for r in df.select(expr_fn(F.col("s")).alias("out")).collect()]


INITIALS_GOLDEN = {
    # R/util.R:118-119 example
    "Auke B.": "AB",
    "Arnold Christoffer": "AC",
    "Arend X. Mark": "AXM",
    "Albert X Johannes": "AXJ",
    "Albert X.Y. Johannes": "AXYJ",
    "J. F.": "JF",
    # edge cases: [A-z] quirk includes  [\]^_` — '_x' initial is extracted
    "_under score": "_s",
    "": "",
    None: None,
}


def test_initials_spark_and_python(spark):
    vals = list(INITIALS_GOLDEN)
    got = _run1(spark, N.initials, vals)
    for v, g in zip(vals, got):
        assert g == INITIALS_GOLDEN[v], v
        assert R.initials(v) == INITIALS_GOLDEN[v], v


PREFIX_GOLDEN = {
    # R/util.R:56-57 examples
    "VAN DER MOLEN": ("VAN DER ", "MOLEN"),
    "DUMOULIN": (None, "DUMOULIN"),
    "DU MOULIN": ("DU ", "MOULIN"),
    "Van der Molen": ("Van der ", "Molen"),  # case-insensitive
    "VAN. SCHALKWYK": ("VAN. ", "SCHALKWYK"),  # the VAN[.] entry
    "VAN DEN BERG": ("VAN DEN ", "BERG"),
    "VANDENBERG": (None, "VANDENBERG"),
    None: (None, None),
}


def test_split_prefixes_spark_and_python(spark):
    vals = list(PREFIX_GOLDEN)
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    p, w = N.split_prefix(F.col("s"))
    got = df.select(p.alias("p"), w.alias("w")).collect()
    for v, r in zip(vals, got):
        assert (r["p"], r["w"]) == PREFIX_GOLDEN[v], v
        assert R.split_prefix(v) == PREFIX_GOLDEN[v], v


def test_rm_diacretics(spark):
    # R/util.R:199-200 example: "éå" → "ea"
    assert _run1(spark, N.rm_diacretics, ["éå"]) == ["ea"]
    assert R.rm_diacretics("éå") == "ea"
    s = "éëêèâáàåüûîïç"
    assert R.rm_diacretics(s) == "eeeeaaaauuiic"
    assert _run1(spark, N.rm_diacretics, [s]) == ["eeeeaaaauuiic"]


def test_clean_name_chain(spark):
    cases = {
        "BOTHA (WED)": "BOTHA",  # junk truncation, traindata_graafreinet.R:68-71
        "  DU TOIT ": "DU TOIT",  # trim
        "": None,  # ''→NA, :48-51
        "X": None,  # placeholder, :93-96
        "SMIT/JR": "SMIT",
        "NAUDé": "NAUD",  # diacritic fold to lowercase then truncation
        "COETZEE 1822": "COETZEE",
        "VISAGIE": "VISAGIE",
        None: None,
    }
    vals = list(cases)
    got = _run1(spark, N.clean_name, vals)
    for v, g in zip(vals, got):
        assert g == cases[v], v
        assert R.clean_name(v) == cases[v], v


def test_len_longest_word(spark):
    # R/util.R:313-318
    vals = ["J F", "JOHANNES X", "A.B.", None]
    got = _run1(spark, N.len_longest_word, vals)
    assert got == [1, 8, 1, None]


def test_is_initials_only(spark):
    got = _run1(spark, N.is_initials_only, ["J F", "JOHANNES"])
    assert got == [1.0, 0.0]


def test_concat_names(spark):
    df = spark.createDataFrame(
        [("BOTHA", "JOHANNES"), ("BOTHA", None), (None, None)],
        "a string, b string",
    )
    got = [
        r["out"]
        for r in df.select(
            N.concat_names(F.col("a"), F.col("b")).alias("out")
        ).collect()
    ]
    assert got == ["BOTHA JOHANNES", "BOTHA", ""]
    assert R.concat_names("BOTHA", "JOHANNES") == "BOTHA JOHANNES"
    assert R.concat_names("BOTHA", None) == "BOTHA"
    assert R.concat_names(None, None) == ""
