"""Parity tests for the §2A intake operators — one fixture per
validation rule (FIXTURES.md family A), asserting the reference's
exact issue strings (streamlit_app.py:156, 176, 178, 187, 189) and the
""-not-NULL / byte-exact-normalization invariants (SURVEY.md §1.4,
§7)."""

from __future__ import annotations

import io

import pandas as pd
import pytest

from free_etl_spark.intake.config import load_cfg
from free_etl_spark.intake.validate import validate_and_normalize

CFG = load_cfg({})

BASE_ROWS = [
    ["R-0001", "Acme Co", "SKU-12-991", "14", "3.99", "2026-01-31", ""],
    ["R-0002", "Beta Inc", "SKU-07-100", "2", "10.50", "2026-02-01", "fragile"],
    ["R-0003", "Acme Co", "SKU-12-991", "7", "3.99", "2026-02-02", ""],
]
HEADER = ["report_id", "distributor", "sku", "qty", "unit_price", "ship_date", "notes"]


def make_csv(delim: str = ",", encoding: str = "utf-8", header=None, rows=None) -> bytes:
    header = header or HEADER
    rows = rows if rows is not None else BASE_ROWS
    lines = [delim.join(header)] + [delim.join(r) for r in rows]
    return ("\n".join(lines) + "\n").encode(encoding)


def test_clean_comma_csv_round_trips_byte_exact():
    data = make_csv()
    chk = validate_and_normalize("clean_comma.csv", data, CFG)
    assert chk.acceptable and not chk.issues
    assert chk.row_count == 3 and chk.col_count == 7
    golden = pd.read_csv(
        io.StringIO(data.decode()), dtype=str, keep_default_na=False
    ).to_csv(index=False).encode("utf-8")
    assert chk.csv_bytes == golden


@pytest.mark.parametrize("delim", [";", "\t", "|"])
def test_delimiter_sniffing_normalizes_to_comma(delim):
    chk = validate_and_normalize("f.csv", make_csv(delim=delim), CFG)
    assert chk.acceptable, chk.issues
    first_line = chk.csv_bytes.decode().splitlines()[0]
    assert first_line == ",".join(HEADER)


def test_bom_stripped():
    data = b"\xef\xbb\xbf" + make_csv()
    chk = validate_and_normalize("bom.csv", data, CFG)
    assert chk.acceptable
    assert chk.csv_bytes.decode("utf-8").startswith("report_id,")


def test_latin1_fallback():
    rows = [["R-1", "Caf\xe9 S.A.", "SKU", "1", "2.00", "2026-01-01", "se\xf1al"]]
    data = make_csv(rows=rows).decode("utf-8").encode("latin-1")
    chk = validate_and_normalize("latin1.csv", data, CFG)
    assert chk.acceptable
    out = chk.csv_bytes.decode("utf-8")
    assert "Caf\xe9" in out and "se\xf1al" in out


def test_empty_cells_stay_empty_strings_not_null():
    chk = validate_and_normalize("empty_not_null.csv", make_csv(), CFG)
    assert chk.df_head[0]["notes"] == ""  # "" not NaN/None (SURVEY §1.4)
    # trailing empty field must survive normalization as empty, not "nan"
    assert b"nan" not in chk.csv_bytes


def test_header_only_csv_matches_reference_dead_code_behavior():
    """Reference quirk (SURVEY §7): zero-row checks are dead code —
    a header-only CSV is ACCEPTED with empty csv_bytes (the df.empty
    guard at streamlit_app.py:180/193 skips both checks and
    normalization). Pinned deliberately."""
    chk = validate_and_normalize("empty_rows.csv", make_csv(rows=[]), CFG)
    assert chk.acceptable
    assert chk.csv_bytes == b""
    assert chk.row_count == 0 and chk.col_count == 0


def test_blank_header_issue():
    """Reference quirk: pandas renames truly-EMPTY header cells to
    'Unnamed: N' before the check at streamlit_app.py:185-187 runs, so
    only WHITESPACE headers trigger the issue. Parity path matches;
    the scale path checks the raw line and flags both
    (tests/test_spark_intake.py)."""
    ws_header = ["report_id", " ", "sku", "qty", "unit_price", "ship_date", "notes"]
    chk = validate_and_normalize("blank.csv", make_csv(header=ws_header), CFG)
    assert "One or more column headers are blank." in chk.issues
    assert not chk.acceptable and chk.csv_bytes == b""
    # truly-empty header cell: mangled by pandas → accepted (reference parity)
    empty_header = ["report_id", "", "sku", "qty", "unit_price", "ship_date", "notes"]
    chk2 = validate_and_normalize("blank2.csv", make_csv(header=empty_header), CFG)
    assert chk2.acceptable and "Unnamed: 1" in chk2.csv_bytes.decode().splitlines()[0]


def test_duplicate_header_issue():
    header = ["report_id", "sku", "sku", "qty", "unit_price", "ship_date", "notes"]
    chk = validate_and_normalize("dup.csv", make_csv(header=header), CFG)
    # pandas mangles dup headers to sku.1 — detect via the raw line,
    # like the reference detects via df.columns BEFORE mangling?  No:
    # the reference checks pandas' post-mangle columns, which de-dups,
    # so reference behavior is NOT flagging... verify ours matches the
    # reference exactly: pandas renames sku->sku.1, so no dup detected.
    ref_df = pd.read_csv(
        io.StringIO(make_csv(header=header).decode()), dtype=str, keep_default_na=False
    )
    ref_headers = [str(c) for c in ref_df.columns]
    expected = len(set(ref_headers)) != len(ref_headers)
    assert ("Duplicate column headers detected." in chk.issues) == expected


def test_ragged_row_fails_parse():
    data = make_csv() + b"R-9999,extra,row,with,way,too,many,fields,here\n"
    chk = validate_and_normalize("ragged.csv", data, CFG)
    assert any(i.startswith("Failed to parse file:") for i in chk.issues)
    assert not chk.acceptable


def test_oversize_rejected():
    cfg = load_cfg({"app": {"max_file_mb": 1}})
    data = make_csv(rows=BASE_ROWS * 40000)  # ~2 MB
    chk = validate_and_normalize("big.csv", data, cfg)
    assert any(i.startswith("File exceeds max size (") for i in chk.issues)


def test_unsupported_extension():
    chk = validate_and_normalize("notes.txt", b"hello", CFG)
    assert chk.issues == ["Unsupported file type. Use CSV or XLSX."]


def test_xlsx_disallowed_by_config():
    cfg = load_cfg({"app": {"allow_xlsx": False}})
    chk = validate_and_normalize("book.xlsx", b"PK\x03\x04fake", cfg)
    assert chk.issues == ["Unsupported file type. Use CSV or XLSX."]


def test_xlsx_garbage_bytes_degrade_to_parse_issue():
    """Whatever the reader (openpyxl or the stdlib xlsx_lite
    fallback), non-xlsx bytes with an .xlsx name get a parse-failure
    issue instead of a crash (reference's op #9 containment)."""
    chk = validate_and_normalize("book.xlsx", b"PK\x03\x04fake", CFG)
    assert any(i.startswith("Failed to parse file:") for i in chk.issues)


def test_xlsx_parses_with_empty_cells_as_empty_strings():
    from tests.conftest import has_openpyxl, make_xlsx_bytes

    data = make_xlsx_bytes(
        pd.DataFrame(
            {"report_id": ["R-1", "R-2"], "qty": ["5", None], "notes": [None, "x"]}
        )
    )
    chk = validate_and_normalize("clean.xlsx", data, CFG)
    assert chk.acceptable, chk.issues
    assert chk.row_count == 2 and chk.col_count == 3
    if has_openpyxl():
        # reference maps NaN -> str via .astype(str).fillna(""): pandas
        # astype(str) turns None into "None" BEFORE fillna — match exactly
        golden = (
            pd.read_excel(io.BytesIO(data), dtype=str, engine="openpyxl")
            .astype(str)
            .fillna("")
            .to_csv(index=False)
            .encode("utf-8")
        )
        assert chk.csv_bytes == golden
    else:
        # xlsx_lite contract: blank cells read back as ""
        assert chk.csv_bytes == (
            b"report_id,qty,notes\nR-1,5,\nR-2,,x\n"
        )


def test_xlsx_lite_round_trip_and_shared_strings():
    """The stdlib fallback itself: writer->reader round-trips XML
    specials, blank cells, and ragged rows; the reader also resolves
    sharedStrings-table cells (the layout real producers emit)."""
    import zipfile as _zf

    from free_etl_spark.intake.xlsx_lite import read_xlsx, write_xlsx

    df = pd.DataFrame(
        {
            "a&b": ["<tag>", 'say "hi"', None],
            "n": ["1.5", None, "x y"],
        }
    )
    back = read_xlsx(write_xlsx(df))
    assert list(back.columns) == ["a&b", "n"]
    assert back.values.tolist() == [
        ["<tag>", "1.5"],
        ['say "hi"', ""],
        ["", "x y"],
    ]

    # handcrafted package using a sharedStrings table + numeric cells
    src = write_xlsx(pd.DataFrame({"placeholder": []}))
    buf = io.BytesIO()
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    with _zf.ZipFile(io.BytesIO(src)) as zin, _zf.ZipFile(buf, "w") as zout:
        for name in zin.namelist():
            if name != "xl/worksheets/sheet1.xml":
                zout.writestr(name, zin.read(name))
        zout.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}"><si><t>col</t></si>'
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        zout.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c>'
            '<c r="B2"><v>42</v></c></row>'  # B1 missing: ragged header
            "</sheetData></worksheet>",
        )
    got = read_xlsx(buf.getvalue())
    assert list(got.columns) == ["col", ""]
    assert got.values.tolist() == [["rich", "42"]]


def test_quoted_fields_round_trip():
    data = b'report_id,notes\nR-1,"has, comma"\nR-2,"has ""quote"""\nR-3,"multi\nline"\n'
    chk = validate_and_normalize("quoted.csv", data, CFG)
    assert chk.acceptable, chk.issues
    back = pd.read_csv(io.BytesIO(chk.csv_bytes), dtype=str, keep_default_na=False)
    assert back["notes"].tolist() == ["has, comma", 'has "quote"', "multi\nline"]


def test_single_column_file_sniffer_fallback():
    """Sniffer quirk (SURVEY §7): single-column files fail sniffing and
    silently fall back to ',' — preserved."""
    data = b"only_col\nv1\nv2\n"
    chk = validate_and_normalize("one.csv", data, CFG)
    assert chk.acceptable and chk.col_count == 1
