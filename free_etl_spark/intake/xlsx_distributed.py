"""Distributed XLSX source: the documented spark-excel escape hatch
(SURVEY §2A op #7 scale note; reference parses XLSX driver-side via
``pd.read_excel`` at streamlit_app.py:172-174), implemented without the
external connector.

The reference's driver-side parse is correct for its 50 MB-capped
upload flow; at scale the real shape is *many* xlsx files on a landing
prefix. This source distributes that: a ``binaryFile`` scan fans the
files across executors (Spark groups small files into tasks via
``spark.sql.files.maxPartitionBytes``, so a 10 000-file landing dir
becomes a few hundred balanced tasks, not 10 000), and each file parses
executor-side inside one Arrow-batched ``mapInPandas`` pass — openpyxl
when available, the stdlib ``xlsx_lite`` reader otherwise, the same
dual path as the driver-side intake op.

Semantics match intake op #7 exactly: first worksheet, header row =
column names, every cell a STRING, blank/missing cells ``""`` (the
``""``-not-NULL invariant, SURVEY §1.4). Files are aligned to the
caller's declared column list by header NAME (a landing dir's files
may order or subset columns differently); a declared column absent
from a file reads as ``""`` for that file's rows.

Memory: xlsx is a zip — not splittable — so each file is parsed whole
by one task. Per-file memory is bounded by the same size guard as the
driver path (op #3); files above ``max_bytes`` fail their own task's
row group, isolated per file when ``on_error='capture'``.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from free_etl_spark.intake.xlsx_lite import read_xlsx


def _parse_one(content: bytes) -> pd.DataFrame:
    """One xlsx payload -> all-string frame (first sheet, header row).
    openpyxl path mirrors validate.py:68-81; stdlib path is xlsx_lite."""
    try:  # optional dependency, identical dual path to intake validate
        import openpyxl  # noqa: F401, PLC0415
        import io  # noqa: PLC0415

        # fillna BEFORE astype: the reverse order (the reference's own
        # quirk, streamlit_app.py:174, kept verbatim in validate.py for
        # parity) stringifies blank cells to the literal 'nan' first,
        # making fillna a no-op — here the documented ''-not-NULL
        # invariant wins so both dual paths agree (ADVICE r11).
        return (
            pd.read_excel(io.BytesIO(content), dtype=str, engine="openpyxl")
            .fillna("")
            .astype(str)
        )
    except ImportError:
        return read_xlsx(content).astype(str).fillna("")


def read_xlsx_distributed(
    spark: SparkSession,
    path: str | list[str],
    columns: list[str],
    include_path: bool = False,
    max_bytes: int | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Scan one-or-many xlsx files into a DataFrame of strings.

    - ``columns``: declared output columns (all ``string``), aligned to
      each file's header by name; missing header -> ``""`` column.
    - ``include_path``: append ``_source_path`` (lineage, like
      ``input_file_name`` on splittable sources).
    - ``max_bytes``: per-file size guard (op #3 parity at the source).
    - ``on_error``: ``'fail'`` raises on the first bad file (FAILFAST
      parity); ``'capture'`` emits one row per bad file with
      ``_error`` set and data columns ``""`` (op #9 parity) — the
      capture schema always carries ``_source_path`` + ``_error``.
    """
    if on_error not in ("fail", "capture"):
        raise ValueError(f"on_error must be fail|capture, got {on_error!r}")
    capture = on_error == "capture"
    with_path = include_path or capture
    out_fields = [f"`{c}` string" for c in columns]
    if with_path:
        out_fields.append("`_source_path` string")
    if capture:
        out_fields.append("`_error` string")
    out_schema = ", ".join(out_fields)

    paths = path if isinstance(path, list) else [path]
    scan = spark.read.format("binaryFile").load(paths).select("path", "content", "length")

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content, length in zip(
                pdf["path"], pdf["content"], pdf["length"]
            ):
                err = None
                frame = None
                if max_bytes is not None and int(length) > max_bytes:
                    err = f"File too large ({int(length)} bytes > {max_bytes})."
                else:
                    try:
                        frame = _parse_one(bytes(content))
                    except Exception as e:  # noqa: BLE001 — per-file isolation
                        err = f"Could not parse file: {e}"
                if err is not None:
                    if not capture:
                        raise ValueError(f"{fpath}: {err}")
                    row = {c: [""] for c in columns}
                    row["_source_path"] = [fpath]
                    row["_error"] = [err]
                    yield pd.DataFrame(row)
                    continue
                out = pd.DataFrame(
                    {
                        c: (
                            frame[c].astype(str)
                            if c in frame.columns
                            else pd.Series([""] * len(frame), dtype=str)
                        )
                        for c in columns
                    }
                )
                if with_path:
                    out["_source_path"] = fpath
                if capture:
                    out["_error"] = None
                yield out

    return scan.mapInPandas(parse, out_schema)
