"""Streaming intake (SURVEY.md §7 Phase 4): a Structured Streaming
file source watches a landing prefix and replays the §2A
validate→normalize pipeline per micro-batch.

The source is ``binaryFile`` (one row per NEW file: path, length,
content) so the per-file semantics of the reference — whole-file
sniffing, raw-header checks, per-file manifest records — are reused
verbatim via ``foreachBatch``. Files are bounded by the max-size
guard (50 MB default), so collecting a micro-batch of them to the
driver is the same memory contract as the reference; the normalized
write stays a Spark job when files are large.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from free_etl_spark.intake.config import AppConfig
from free_etl_spark.intake.sinks import sanitize_stem
from free_etl_spark.intake.validate import validate_and_normalize


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
    per-session manifest (streamlit_app.py:313-329)."""
    os.makedirs(out_dir, exist_ok=True)

    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.*")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(landing_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        files = batch_df.select("path", "content").collect()
        records = []
        for row in files:
            name = os.path.basename(row["path"])
            chk = validate_and_normalize(name, bytes(row["content"]), cfg)
            if chk.acceptable and chk.csv_bytes:
                with open(os.path.join(out_dir, sanitize_stem(name) + ".csv"), "wb") as f:
                    f.write(chk.csv_bytes)
            records.append(
                {
                    "original_name": name,
                    "issues": chk.issues,
                    "acceptable": chk.acceptable,
                    "rows": chk.row_count,
                    "cols": chk.col_count,
                }
            )
        if records:
            with open(os.path.join(out_dir, f"manifest-{batch_id}.json"), "w") as f:
                json.dump({"batch_id": batch_id, "files": records}, f, indent=2)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
