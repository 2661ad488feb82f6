"""Streaming intake (SURVEY.md §7 Phase 4): a Structured Streaming
file source watches a landing prefix and replays the §2A
validate→normalize pipeline per micro-batch.

The source is ``binaryFile`` (one row per NEW file: path, length,
content) so the per-file semantics of the reference — whole-file
sniffing, raw-header checks, per-file manifest records — are reused
verbatim via ``foreachBatch``. Validation and the normalized-CSV
write run ON THE EXECUTORS (Arrow-batched ``mapInPandas`` over
(path, content)): file bytes never flow through the driver, so a
micro-batch costs the driver only the per-file audit records (a few
hundred bytes each) regardless of ``maxFilesPerTrigger`` × 50 MB.
The driver's only write is the manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from free_etl_spark.intake.config import AppConfig
from free_etl_spark.intake.sinks import sanitize_stem
from free_etl_spark.intake.validate import validate_and_normalize


def _assert_out_dir_placement(out_dir: str, master: str) -> None:
    """Executor-side writes land where the task runs: a LOCAL-disk
    ``out_dir`` is only correct when the executors are the driver's
    machine (``local[*]``). On any other master, require a shared /
    object-store URI so files and the driver-written manifest agree."""
    from pyarrow import fs as pafs  # noqa: PLC0415

    fs_root, _ = pafs.FileSystem.from_uri(out_dir)
    if isinstance(fs_root, pafs.LocalFileSystem) and not master.startswith(
        "local"
    ):
        raise ValueError(
            f"out_dir={out_dir!r} resolves to executor-LOCAL disk but "
            f"master={master!r} is multi-node: normalized files would land "
            "scattered across executor machines while the driver-side "
            "manifest claims them. Use a shared/object-store URI "
            "(s3://…, hdfs://…) for out_dir on a real cluster."
        )


def normalize_file_to_fs(name, content, cfg, filesystem, out_root):
    """Validate one landing file and, when acceptable, write its
    normalized CSV through a ``pyarrow.fs`` filesystem (NEVER bare
    ``open()`` — on a cluster that is executor-local disk); return the
    per-file audit record. This is the executor-side unit of work of
    ``start_streaming_intake`` — extracted so the non-local write path
    is directly testable against a mock:// filesystem
    (tests/test_streaming.py::test_normalize_roundtrip_via_mock_fs)."""
    chk = validate_and_normalize(name, content, cfg)
    if chk.acceptable and chk.csv_bytes:
        dest = out_root.rstrip("/") + "/" + sanitize_stem(name) + ".csv"
        with filesystem.open_output_stream(dest) as f:
            f.write(chk.csv_bytes)
    return {
        "original_name": name,
        "issues": chk.issues,
        "acceptable": chk.acceptable,
        "rows": chk.row_count,
        "cols": chk.col_count,
    }


def write_manifest(filesystem, out_root: str, batch_id: int, files: list) -> None:
    """Write one micro-batch's manifest JSON through the same
    ``pyarrow.fs`` filesystem the normalized files used, so the audit
    record and the data it describes land in the same store."""
    dest = out_root.rstrip("/") + f"/manifest-{batch_id}.json"
    payload = json.dumps({"batch_id": batch_id, "files": files}, indent=2).encode()
    with filesystem.open_output_stream(dest) as f:
        f.write(payload)


def start_streaming_intake(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: AppConfig,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Start (and return) the streaming query. With
    ``available_now=True`` it drains the current landing-dir contents
    and stops — the replayable batch-catchup mode; otherwise it keeps
    watching. Each micro-batch writes normalized CSVs plus one
    ``manifest-<batch>.json`` audit record, mirroring the reference's
    per-session manifest (streamlit_app.py:313-329).

    Output placement: normalized CSVs are written EXECUTOR-side, so
    ``out_dir`` is resolved through ``pyarrow.fs`` from its URI (object
    stores and shared filesystems work wherever the task runs). A
    plain local path only lands on the right machine when the executors
    ARE the driver's machine — enforced below rather than assumed."""
    from pyarrow import fs as pafs  # noqa: PLC0415 — also imported on executors

    _assert_out_dir_placement(out_dir, spark.sparkContext.master)
    fs_root, _ = pafs.FileSystem.from_uri(out_dir)
    if isinstance(fs_root, pafs.LocalFileSystem):
        os.makedirs(out_dir, exist_ok=True)

    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.*")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(landing_dir)
    )

    def validate_partition(batches):
        """Executor-side: validate + normalize each file of the Arrow
        batch, write the normalized CSV through the filesystem resolved
        from ``out_dir``'s URI (NOT bare ``open()`` — that would be
        executor-local disk on a cluster), emit one audit row per file.
        Runs inside mapInPandas — no driver involvement."""
        import pandas as pd  # noqa: PLC0415 — executor import
        from pyarrow import fs as pafs  # noqa: PLC0415 — executor import

        filesystem, out_root = pafs.FileSystem.from_uri(out_dir)
        for pdf in batches:
            out = [
                normalize_file_to_fs(
                    os.path.basename(path), bytes(content), cfg, filesystem, out_root
                )
                for path, content in zip(pdf["path"], pdf["content"])
            ]
            yield pd.DataFrame(
                out,
                columns=["original_name", "issues", "acceptable", "rows", "cols"],
            )

    audit_schema = (
        "original_name string, issues array<string>, acceptable boolean, "
        "rows long, cols long"
    )

    def process_batch(batch_df, batch_id: int) -> None:
        # spread the ≤ maxFilesPerTrigger files across executors (the
        # binaryFile source may pack them into few input partitions);
        # only the tiny audit rows come back to the driver
        records = (
            batch_df.select("path", "content")
            .repartition("path")
            .mapInPandas(validate_partition, schema=audit_schema)
            .collect()
        )
        if records:
            files = sorted(
                (
                    {
                        "original_name": r["original_name"],
                        "issues": list(r["issues"]),
                        "acceptable": r["acceptable"],
                        "rows": r["rows"],
                        "cols": r["cols"],
                    }
                    for r in records
                ),
                key=lambda d: d["original_name"],
            )
            filesystem, out_root = pafs.FileSystem.from_uri(out_dir)
            write_manifest(filesystem, out_root, batch_id, files)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
