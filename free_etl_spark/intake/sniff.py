"""Driver-side head-sample utilities (SURVEY.md §2A ops #4, #5, #12,
#13). These are deliberately NOT DataFrame ops: delimiter sniffing and
raw-header checks need the first bytes of the file before Spark's CSV
reader gets to rename/dedup headers (SURVEY.md §7 "What's hard" #2).
Only ~4 KB per file ever touches driver memory.
"""

from __future__ import annotations

import csv
import io

SNIFF_SAMPLE_CHARS = 4096  # reference: streamlit_app.py:81
CANDIDATE_DELIMS = [",", ";", "\t", "|"]  # reference: streamlit_app.py:81


def detect_csv_delimiter(sample_bytes: bytes) -> str:
    """csv.Sniffer over the first 4096 decoded chars; any failure
    (including single-column files) silently falls back to ","
    (reference parity: streamlit_app.py:78-84)."""
    try:
        sample = sample_bytes.decode("utf-8", errors="ignore")
        return csv.Sniffer().sniff(sample[:SNIFF_SAMPLE_CHARS], delimiters=CANDIDATE_DELIMS).delimiter
    except Exception:
        return ","


def bytes_to_text(b: bytes) -> str:
    """utf-8-sig decode (strips BOM); undecodable input falls back to
    latin-1 with U+FFFD replacement (reference parity:
    streamlit_app.py:86-90)."""
    try:
        return b.decode("utf-8-sig")
    except UnicodeDecodeError:
        return b.decode("latin-1", errors="replace")


def detect_encoding(sample_bytes: bytes) -> str:
    """Charset label for Spark's CSV reader matching bytes_to_text's
    decision: UTF-8 when the sample decodes, else ISO-8859-1."""
    try:
        sample_bytes.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "ISO-8859-1"


def raw_header_fields(head_bytes: bytes, delimiter: str) -> list[str]:
    """Parse the first line of the raw file into header fields using
    the csv module (respects quoting), BEFORE any DataFrame read —
    Spark renames blank headers to _c<i> and errors/dedups duplicate
    ones, so these checks must see the raw line (SURVEY.md §2A #12-13)."""
    text = bytes_to_text(head_bytes)
    first_line = text.splitlines()[0] if text else ""
    reader = csv.reader(io.StringIO(first_line), delimiter=delimiter)
    try:
        return next(reader)
    except StopIteration:
        return []


def check_headers(headers: list[str]) -> list[str]:
    """Structural header checks with the reference's exact issue
    strings (streamlit_app.py:185-189)."""
    issues: list[str] = []
    if any(str(c).strip() == "" for c in headers):
        issues.append("One or more column headers are blank.")
    if len(set(headers)) != len(headers):
        issues.append("Duplicate column headers detected.")
    return issues
