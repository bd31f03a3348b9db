"""Dependency-free .xlsx reader/writer (SURVEY §2.1 S2 / S5).

The reference reads label spreadsheets with ``readxl::read_xlsx``
(data_raw/data_capetown.R:14-16, data_raw/pretrained.R:185-187,323-324) and
exports review sheets with ``writexl::write_xlsx``
(data_raw/pretrained.R:345-347). The sandbox has no openpyxl/xlrd, but
.xlsx is just a zip of XML parts — this module parses/emits the small
subset those label sheets use (shared strings, inline strings, numbers,
booleans) with only the standard library. Like readxl, the first row
supplies column names and cells are typed per-cell; like the reference's
usage, these are SMALL driver-side sheets (human labels, review exports) —
the DataFrame is parallelized after a driver-side parse, never a
distributed scan.

Scope (documented): no formula evaluation (cached formula values are read),
no date/style decoding (dates come back as Excel serial numbers), one
sheet per call.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'C7' → 2 (zero-based column)."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>…; concatenate all t descendants
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet: str | int | None) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_PKG_REL_NS}Relationship")
    }
    sheets = []  # (name, path)
    for sh in wb.iter(f"{_NS}sheet"):
        target = rel_target[sh.get(f"{_REL_NS}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target.lstrip("/")
        sheets.append((sh.get("name"), target))
    if sheet is None or sheet == 0:
        return sheets[0][1]
    if isinstance(sheet, int):
        return sheets[sheet][1]
    for name, path in sheets:
        if name == sheet:
            return path
    raise KeyError(f"sheet {sheet!r} not found; have {[s[0] for s in sheets]}")


def _cell_value(c: ET.Element, shared: list[str]):
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype in ("str", "e"):  # cached formula string / error literal
        return v.text
    # numeric: int when exact, else float (readxl returns doubles; int-exact
    # values keep a lossless long so ids survive)
    f = float(v.text)
    return int(f) if f.is_integer() and abs(f) < 2**62 else f


def read_xlsx_rows(path: str, sheet: str | int | None = None) -> tuple[list[str], list[list]]:
    """Parse one worksheet → (header, data rows). Driver-side, stdlib-only."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_path(zf, sheet)))
        rows: list[list] = []
        width = 0
        for row in root.iter(f"{_NS}row"):
            vals: list = []
            for c in row.iter(f"{_NS}c"):
                idx = _col_index(c.get("r", ""))
                if idx < 0:  # no ref attr: append positionally
                    idx = len(vals)
                while len(vals) <= idx:
                    vals.append(None)
                vals[idx] = _cell_value(c, shared)
            rows.append(vals)
            width = max(width, len(vals))
    for vals in rows:
        vals.extend([None] * (width - len(vals)))
    if not rows:
        return [], []
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return header, rows[1:]


def read_excel_stdlib(
    spark: SparkSession, path: str, sheet: str | int | None = None
) -> DataFrame:
    """readxl::read_xlsx analog with no external engine. Column types are
    unified per column like readxl's guessing: all-numeric → double/long,
    any string → string (numbers rendered via str), bools kept."""
    header, rows = read_xlsx_rows(path, sheet)
    if not rows:
        raise ValueError(f"no data rows in {path}")
    ncol = len(header)
    fields = []
    pyrows = []
    kinds = []
    for i in range(ncol):
        col = [r[i] for r in rows]
        has_str = any(isinstance(v, str) for v in col)
        has_float = any(isinstance(v, float) for v in col)
        has_int = any(isinstance(v, bool) is False and isinstance(v, int) for v in col)
        has_bool = any(isinstance(v, bool) for v in col)
        if has_str:
            kinds.append("string")
        elif has_float:
            kinds.append("double")
        elif has_int:
            kinds.append("long")
        elif has_bool:
            kinds.append("boolean")
        else:
            kinds.append("string")
        fields.append(f"`{header[i]}` {kinds[-1]}")
    for r in rows:
        out = []
        for i, v in enumerate(r):
            if v is None:
                out.append(None)
            elif kinds[i] == "string":
                out.append(v if isinstance(v, str) else str(v))
            elif kinds[i] == "double":
                out.append(float(v))
            elif kinds[i] == "long":
                out.append(int(v))
            else:
                out.append(bool(v))
        pyrows.append(out)
    return spark.createDataFrame(pyrows, schema=", ".join(fields))


# ---------------------------------------------------------------- writer

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _wb_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(65 + rem) + s
    return s


_ILLEGAL_XML = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _sheet_xml(header: list[str], rows: list[list]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        "<sheetData>",
    ]
    for rnum, vals in enumerate([list(header)] + rows, start=1):
        cells = []
        for i, v in enumerate(vals):
            ref = f"{_col_letter(i)}{rnum}"
            if v is None:
                continue
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                txt = escape(_ILLEGAL_XML.sub("", str(v)))
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{txt}</t></is></c>')
        parts.append(f'<row r="{rnum}">{"".join(cells)}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """writexl::write_xlsx analog (data_raw/pretrained.R:345-347): collect a
    SMALL review/label frame driver-side and emit one .xlsx. Use
    write_review_csv for anything large."""
    header = df.columns
    rows = [[row[c] for c in header] for row in df.collect()]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _wb_xml(sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", _sheet_xml(header, rows))
