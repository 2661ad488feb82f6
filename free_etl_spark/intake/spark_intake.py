"""Scale path: the §2A validate→normalize pipeline as Spark jobs
(SURVEY.md §3 "Spark-native lifecycle").

Driver-side work per file is bounded: a stat + a 4 KB head sample
(sniff + raw-header checks). Parsing and re-serialization run on
executors (vectorized CSV datasource, FAILFAST), so a 500 GB input
file works exactly like a 5 MB one — only ``single_file=True`` output
shape (reference parity: one object per input) forces a coalesce(1).

Local paths use plain ``open``; on a real cluster the same two probes
(length + head bytes) go through the Hadoop FileSystem API or
``boto3 get_object(Range=...)`` — the pipeline shape is unchanged.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.intake.config import AppConfig
from free_etl_spark.intake.sniff import (
    SNIFF_SAMPLE_CHARS,
    check_headers,
    detect_csv_delimiter,
    detect_encoding,
    raw_header_fields,
)
from free_etl_spark.intake.sinks import sanitize_stem


@dataclass
class SparkFileAudit:
    """Audit record for one input file on the scale path (the scale
    analogue of validate.FileCheck — data stays distributed, so no
    csv_bytes)."""

    path: str
    original_name: str
    issues: list[str] = field(default_factory=list)
    acceptable: bool = False
    row_count: int = 0
    col_count: int = 0
    delimiter: str = ","
    encoding: str = "UTF-8"


def _head_bytes(path: str, n: int = SNIFF_SAMPLE_CHARS) -> bytes:
    with open(path, "rb") as f:
        return f.read(n)


def validate_file(spark: SparkSession, path: str, cfg: AppConfig) -> tuple[SparkFileAudit, DataFrame | None]:
    """Validate one landing file; returns (audit, normalized DataFrame
    or None). Issue strings match the reference exactly
    (streamlit_app.py:156, 176, 178, 186-189)."""
    name = os.path.basename(path)
    audit = SparkFileAudit(path=path, original_name=name)

    size_mb = os.path.getsize(path) / (1024 * 1024)
    if size_mb > cfg.max_file_mb:
        audit.issues.append(
            f"File exceeds max size ({size_mb:.1f} MB > {cfg.max_file_mb} MB)."
        )

    if not name.lower().endswith(".csv"):
        # XLSX on the scale path: driver-side openpyxl is correct for
        # parity because op #3 bounds size to max_file_mb (SURVEY.md §7
        # hard-point 5); route through validate.validate_and_normalize.
        audit.issues.append("Unsupported file type. Use CSV or XLSX.")
        return audit, None

    head = _head_bytes(path)
    audit.delimiter = detect_csv_delimiter(head)
    audit.encoding = detect_encoding(head)
    # raw-header checks BEFORE the DataFrame read — Spark renames blank
    # headers to _c<i> and errors on duplicates (SURVEY.md §2A #12-13)
    audit.issues.extend(check_headers(raw_header_fields(head, audit.delimiter)))

    df = None
    try:
        df = (
            spark.read.option("header", True)
            .option("sep", audit.delimiter)
            .option("encoding", audit.encoding)
            .option("inferSchema", False)
            .option("mode", "FAILFAST")  # ≅ pandas on_bad_lines="error"
            .csv(path)
            .na.fill("")  # ""-not-NULL invariant (SURVEY.md §1.4)
        )
        # Full-width no-op write: the FAILFAST parse check. A pruned
        # scan (count(), or even count(concat_ws(all cols))) lets the
        # Univocity parser skip token-arity checking, so malformed rows
        # sail through — only a full-schema materialization trips it.
        df.write.format("noop").mode("overwrite").save()
        audit.row_count = df.count()
        audit.col_count = len(df.columns)
    except Exception as e:
        first = str(e).splitlines()[0] if str(e) else repr(e)
        audit.issues.append(f"Failed to parse file: {first[:300]}")
        df = None

    audit.acceptable = not audit.issues
    return audit, (df if audit.acceptable else None)


def normalize_to_csv(df: DataFrame, out_dir: str, out_name: str, single_file: bool = True) -> str:
    """Write the normalized UTF-8 comma CSV. ``single_file=True``
    matches the reference's one-object-per-input shape (coalesce(1) +
    rename of the part file — SURVEY.md §4 "output layout");
    ``False`` keeps partitioned output for genuinely large files."""
    tmp = os.path.join(out_dir, f"_tmp_{out_name}")
    writer = (df.coalesce(1) if single_file else df).write.option("header", True).option(
        "emptyValue", ""
    ).option("lineSep", "\n").mode("overwrite")
    try:
        writer.csv(tmp)
        if not single_file:
            return tmp
        part = globmod.glob(os.path.join(tmp, "part-*.csv"))[0]
        dest = os.path.join(out_dir, out_name)
        shutil.move(part, dest)
    finally:
        if single_file and os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return dest


def ingest_directory(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    cfg: AppConfig,
    pattern: str = "*",
) -> tuple[list[SparkFileAudit], DataFrame]:
    """Validate every file in a landing directory, normalize the
    acceptable ones (one output object per input, sanitized name), and
    return (audits, audit DataFrame). Per-file error isolation: a
    failed file never aborts the batch (streamlit_app.py:177-178,
    310-311)."""
    os.makedirs(out_dir, exist_ok=True)
    audits: list[SparkFileAudit] = []
    for path in sorted(globmod.glob(os.path.join(landing_dir, pattern))):
        audit, df = validate_file(spark, path, cfg)
        if df is not None:
            try:
                normalize_to_csv(df, out_dir, sanitize_stem(audit.original_name) + ".csv")
            except Exception as e:
                audit.issues.append(f"Failed to normalize to CSV: {e}")
                audit.acceptable = False
        audits.append(audit)
    audit_df = spark.createDataFrame(
        [
            (a.original_name, a.issues, a.acceptable, a.row_count, a.col_count, a.delimiter, a.encoding)
            for a in audits
        ],
        "original_name string, issues array<string>, acceptable boolean, "
        "row_count long, col_count long, delimiter string, encoding string",
    )
    return audits, audit_df
