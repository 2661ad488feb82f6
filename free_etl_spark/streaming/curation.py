"""Streaming text curation: the batch quality operators applied to a
document STREAM — the shape a continuous ingestion pipeline runs
(north-star extension; the reference has no streaming surface,
SURVEY.md §2A "notably absent").

The stream reuses the exact batch column expressions, so curation
logic exists once and the stream-equals-batch contract is testable —
the same design as streaming/intake.py's reuse of the §2A validators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from free_etl_spark.registry import query
from free_etl_spark.streaming.windows import run_to_completion

_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a bounded file stream (same pattern as
    windows.events_stream: directory source + glob filter)."""
    return (
        spark.readStream.schema(_DOCS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


@query(
    "streaming_quality_gate",
    oracle="""
    WITH t AS (
      SELECT lang,
             CAST(LEN(string_split(text, ' ')) AS BIGINT) AS token_cnt,
             CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
               / LEN(string_split(text, ' ')) AS avg_tok,
             n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_seen,
           CAST(COUNT(*) FILTER (WHERE n_chars >= 100 AND token_cnt >= 30
                                 AND avg_tok BETWEEN 3 AND 8) AS BIGINT)
             AS n_kept
    FROM t GROUP BY lang
    """,
)
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous quality gating: the quality_filter_funnel rule gate
    evaluated over a document stream, with per-language seen/kept
    counters maintained as a streaming aggregation (complete-mode
    memory sink under AvailableNow replay; in production this is the
    curation dashboard a file-source stream feeds). The filter columns
    are pure map-side expressions, so the only streaming state is the
    |langs|-row counter aggregate — constant regardless of throughput.
    Must equal the batch rule gate — which is the oracle."""
    docs = documents_stream(spark, sf_dir)
    token_cnt = F.size(F.split("text", " "))
    avg_tok = (
        F.length(F.replace(F.col("text"), F.lit(" "))).cast("double") / token_cnt
    )
    keep = (
        (F.col("n_chars") >= 100)
        & (token_cnt >= 30)
        & avg_tok.between(3, 8)
    )
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
    )
    return run_to_completion(agg, "complete")
