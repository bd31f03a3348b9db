"""S2/S5: dependency-free .xlsx reader/writer (readxl / writexl analogs)."""

from __future__ import annotations

import zipfile

import pytest

from capelinker_spark.sources import read_excel
from capelinker_spark.sources_excel import read_xlsx_rows, write_xlsx


def test_roundtrip_write_read(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "Botha", 0.95, True, None),
            (2, "van der Merwe & Co <oops>", None, False, "note"),
            (3, "Müller", -2.5, None, "ok"),
        ],
        "persid long, name string, score double, correct boolean, remark string",
    )
    path = str(tmp_path / "labels.xlsx")
    write_xlsx(df, path, sheet_name="labels")
    back = read_excel(spark, path)
    assert back.columns == df.columns
    rows = {r["persid"]: r for r in back.collect()}
    assert rows[1]["name"] == "Botha" and rows[1]["correct"] is True
    assert rows[2]["name"] == "van der Merwe & Co <oops>"
    assert rows[2]["score"] is None and rows[2]["correct"] is False
    assert rows[3]["name"] == "Müller" and rows[3]["score"] == -2.5
    assert dict(back.dtypes)["score"] == "double"
    assert dict(back.dtypes)["persid"] == "bigint"


def _write_raw_xlsx(path, shared_strings_xml, sheet_xml, sheet_name="Sheet1"):
    """Handcrafted xlsx exercising the sharedStrings code path (the
    module's own writer emits inlineStr, so this covers what readxl's
    typical inputs actually contain)."""
    from capelinker_spark.sources_excel import (
        _CONTENT_TYPES,
        _ROOT_RELS,
        _WB_RELS,
        _wb_xml,
    )

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _wb_xml(sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        if shared_strings_xml:
            zf.writestr("xl/sharedStrings.xml", shared_strings_xml)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def test_shared_strings_and_gaps(spark, tmp_path):
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sst = (
        f'<?xml version="1.0"?><sst {ns} count="3" uniqueCount="3">'
        "<si><t>id</t></si><si><t>name</t></si>"
        "<si><r><t>rich </t></r><r><t>text</t></r></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>2</v></c></row>'
        '<row r="3"><c r="A3"><v>8.5</v></c></row>'  # B3 missing entirely
        "</sheetData></worksheet>"
    )
    path = str(tmp_path / "sst.xlsx")
    _write_raw_xlsx(path, sst, sheet)
    header, rows = read_xlsx_rows(path)
    assert header == ["id", "name"]
    assert rows == [[7, "rich text"], [8.5, None]]
    df = read_excel(spark, path)
    assert dict(df.dtypes) == {"id": "double", "name": "string"}
    got = sorted(df.collect(), key=lambda r: r["id"])
    assert got[0]["name"] == "rich text" and got[1]["name"] is None


def test_sheet_by_name_missing(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "x long, y string")
    path = str(tmp_path / "one.xlsx")
    write_xlsx(df, path, sheet_name="labels")
    assert read_excel(spark, path, sheet="labels").count() == 1
    with pytest.raises(KeyError):
        read_xlsx_rows(path, sheet="nope")
