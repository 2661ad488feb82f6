"""Per-file validation + normalization — parity path (SURVEY.md §2A
ops #3, #6-17; reference: streamlit_app.py:135-209).

Byte-exact with the reference for in-bounds files: all cells are
strings, empty cells stay "" (never NULL/NaN — SURVEY.md §1.4, the
single most important invariant), normalized output is UTF-8
comma-delimited QUOTE_MINIMAL CSV with "\\n" line terminator, exactly
``pandas.to_csv(index=False)``.

Reference quirks preserved deliberately (SURVEY.md §7 "quirks"):

- the zero-row / zero-column issues are dead code in the reference
  (guarded by ``if not df.empty``) — a header-only CSV is accepted
  with empty ``csv_bytes``; we match that literally and pin it in
  tests (tests/test_intake_validate.py::test_header_only_csv).
- csv.Sniffer failure silently falls back to ",".
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from free_etl_spark.intake.config import AppConfig
from free_etl_spark.intake.sniff import bytes_to_text, check_headers, detect_csv_delimiter


@dataclass
class FileCheck:
    """Per-file audit record (reference FileCheck, streamlit_app.py:135-143).
    ``df_head`` holds ≤10 preview rows as list-of-dicts (engine-neutral
    rather than a pandas object)."""

    original_name: str
    issues: list[str] = field(default_factory=list)
    acceptable: bool = False
    df_head: list[dict] = field(default_factory=list)
    row_count: int = 0
    col_count: int = 0
    csv_bytes: bytes = b""


def validate_and_normalize(name: str, data: bytes, cfg: AppConfig) -> FileCheck:
    """Validate one uploaded file and (when clean) normalize it to
    UTF-8 comma CSV. Mirrors streamlit_app.py:145-209 stage by stage;
    exact issue strings from :156, :176, :178, :182, :184, :187, :189."""
    name_lower = name.lower()
    issues: list[str] = []

    size_mb = len(data) / (1024 * 1024)  # op #3, :149-156
    if size_mb > cfg.max_file_mb:
        issues.append(f"File exceeds max size ({size_mb:.1f} MB > {cfg.max_file_mb} MB).")

    df = pd.DataFrame()
    try:
        if name_lower.endswith(".csv"):
            # ops #4-6: sniff → decode → strict all-string parse
            delim = detect_csv_delimiter(data)
            df = pd.read_csv(
                __import__("io").StringIO(bytes_to_text(data)),
                dtype=str,
                sep=delim,
                engine="python",
                on_bad_lines="error",
                keep_default_na=False,  # "" stays "", never NaN (§1.4)
            )
        elif name_lower.endswith(".xlsx") and cfg.allow_xlsx:
            # op #7: first sheet, all-string, NaN→""
            try:
                df = (
                    pd.read_excel(__import__("io").BytesIO(data), dtype=str, engine="openpyxl")
                    .astype(str)
                    .fillna("")
                )
            except ImportError:
                # openpyxl absent: stdlib zip+XML reader (xlsx_lite) —
                # same contract (first sheet, all-string, blanks → "")
                from free_etl_spark.intake.xlsx_lite import read_xlsx

                df = read_xlsx(data).astype(str).fillna("")
        else:
            issues.append("Unsupported file type. Use CSV or XLSX.")  # op #8
    except Exception as e:  # op #9: parse failure is an issue, not a crash
        issues.append(f"Failed to parse file: {e}")

    if not df.empty:  # ops #10-13 (note: #10/#11 are dead code, kept for parity)
        if df.shape[0] == 0:
            issues.append("No data rows found.")
        if df.shape[1] == 0:
            issues.append("No columns detected (empty header).")
        issues.extend(check_headers([str(c) for c in df.columns.tolist()]))

    csv_bytes = b""
    if not issues and not df.empty:  # op #15: normalize only when clean
        try:
            csv_bytes = df.to_csv(index=False).encode("utf-8")
        except Exception as e:
            issues.append(f"Failed to normalize to CSV: {e}")

    return FileCheck(
        original_name=name,
        issues=issues,
        acceptable=not issues,  # op #14
        df_head=df.head(10).to_dict("records") if not df.empty else [],  # op #16
        row_count=int(df.shape[0]) if not df.empty else 0,  # op #17
        col_count=int(df.shape[1]) if not df.empty else 0,
        csv_bytes=csv_bytes,
    )
