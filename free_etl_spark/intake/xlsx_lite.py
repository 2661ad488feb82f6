"""Minimal stdlib XLSX reader/writer (zipfile + ElementTree) used when
openpyxl is unavailable, so the intake's XLSX operator (reference
streamlit_app.py:165-169 parity, SURVEY §2A op #7) stays exercisable
in environments without the optional dependency.

Scope is intake-shaped on purpose: first worksheet only, every cell as
text (numbers keep their raw lexical form, matching
``pd.read_excel(dtype=str)``), blank/missing cells read back as ``""``.
The writer emits inline strings only — no sharedStrings, styles, or
formulas — which the reader (and openpyxl) can round-trip.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_to_idx(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 ..."""
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _idx_to_col(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    out = []
    for si in root.findall("m:si", _NS):
        # rich-text runs split one string across multiple <t>: concat
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the FIRST sheet in workbook order via the workbook
    relationships; fall back to the lexically first sheet file."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rid_attr = (
            "{http://schemas.openxmlformats.org/officeDocument/2006/"
            "relationships}id"
        )
        first = wb.find("m:sheets/m:sheet", _NS)
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        targets = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(
                "{http://schemas.openxmlformats.org/package/2006/"
                "relationships}Relationship"
            )
        }
        target = targets[first.get(rid_attr)]
        return target if target.startswith("xl/") else f"xl/{target}"
    except Exception:  # malformed rels — fall back to naming convention
        sheets = sorted(
            n for n in zf.namelist() if n.startswith("xl/worksheets/sheet")
        )
        if not sheets:
            raise ValueError("xlsx contains no worksheets") from None
        return sheets[0]


def _cell_value(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(
            el.text or "" for el in c.iter(f"{{{_NS['m']}}}t")
        )
    v = c.find("m:v", _NS)
    raw = v.text if v is not None and v.text is not None else ""
    if t == "s":
        return shared[int(raw)]
    if t == "b":
        return "TRUE" if raw == "1" else "FALSE"
    return raw  # "n" numbers and "str" formula results keep lexical form


def read_xlsx(data: bytes) -> pd.DataFrame:
    """First worksheet -> all-string DataFrame; row 1 is the header,
    blank/missing cells are ``""``. Raises on anything that is not a
    valid xlsx package (callers surface that as a parse-failure issue,
    op #9)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(_first_sheet_path(zf)))
        rows: list[dict[int, str]] = []
        for row in root.findall("m:sheetData/m:row", _NS):
            cells: dict[int, str] = {}
            for pos, c in enumerate(row.findall("m:c", _NS)):
                ref = c.get("r")
                m = _CELL_REF.match(ref) if ref else None
                cells[_col_to_idx(m.group(1)) if m else pos] = _cell_value(
                    c, shared
                )
            rows.append(cells)
    if not rows:
        return pd.DataFrame()
    width = max(max(r.keys(), default=-1) for r in rows) + 1
    grid = [[r.get(i, "") for i in range(width)] for r in rows]
    header, body = grid[0], grid[1:]
    return pd.DataFrame(body, columns=header, dtype=str)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xlsx(df: pd.DataFrame) -> bytes:
    """DataFrame -> minimal single-sheet xlsx (inline strings; None ->
    blank cell). Exists so the no-openpyxl test path can fabricate
    fixtures; not a general-purpose writer."""
    rows_xml = []
    table = [list(map(str, df.columns))] + [
        [None if v is None or v != v else str(v) for v in rec]
        for rec in df.itertuples(index=False, name=None)
    ]
    for ri, rec in enumerate(table, start=1):
        cells = []
        for ci, val in enumerate(rec):
            if val is None:
                continue
            ref = f"{_idx_to_col(ci)}{ri}"
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{_xml_escape(val)}</t></is></c>"
            )
        rows_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS["m"]}"><sheetData>'
        + "".join(rows_xml)
        + "</sheetData></worksheet>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS["m"]}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()
