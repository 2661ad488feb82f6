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


def _stream_band_signatures(docs: DataFrame) -> DataFrame:
    """Per-document banded minhash signatures computed MAP-SIDE over a
    document stream: (doc_id, band_id, band_key), one row per band.

    Identical values to the batch index (queries/dedup._minhash_bands)
    by construction — same shingles, same per-seed md5 min, same band
    digest — but expressed as array ops over each row instead of an
    explode + groupBy, because a streaming groupBy per doc would drag
    every shingle through stateful shuffle. min over the distinct
    shingle array equals min over exploded distinct rows, so the two
    formulations agree string-for-string."""
    from free_etl_spark.queries.dedup import _N_BANDS, _N_HASHES, _NGRAM

    # materialize the token array before the transform: a split()
    # expression referenced inside the lambda re-evaluates per element
    # (O(tokens^2) per doc — measured 10x at sf0.1 on the batch side)
    sh_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - (_NGRAM - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, _NGRAM)),
        )
    )
    with_sh = (
        docs.withColumn("tk", F.split("text", " "))
        .filter(F.size("tk") >= _NGRAM)
        .withColumn("sh_arr", sh_arr)
    )

    def _minhash(seed: int) -> F.Column:
        # one-arg lambda: a two-parameter callable would make
        # F.transform pass the ELEMENT INDEX as the second argument
        return F.array_min(
            F.transform(
                F.col("sh_arr"),
                lambda x: F.md5(F.concat(F.lit(f"{seed}|"), x).cast("binary")),
            )
        )

    hs = [_minhash(s).alias(f"h{s}") for s in range(_N_HASHES)]
    sig = with_sh.select("doc_id", *hs)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")).cast(
                        "binary"
                    )
                ).alias("band_key"),
            )
            for b in range(_N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_key").alias("band_key"),
    )


def _neardup_oracle() -> str:
    from free_etl_spark.queries.dedup import _SH_SQL, _minhash_band_sql

    return f"""
    WITH {_SH_SQL},
    {_minhash_band_sql()},
    hits AS (
      SELECT a.doc_id, COUNT(b.doc_id) AS n_cand_hits
      FROM bands a LEFT JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id
    )
    SELECT doc_id, CAST(n_cand_hits AS BIGINT) AS n_cand_hits,
           n_cand_hits > 0 AS is_neardup
    FROM hits
    """


@query("streaming_neardup_filter", oracle=_neardup_oracle())
def streaming_neardup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-duplicate filter: every incoming document is
    minhash-banded MAP-SIDE (no streaming state for the signature)
    and probed against the STATIC historical band index — the shape
    of a continuous ingestion pipeline deduping new crawl against the
    existing corpus. The probe is a stream-static left join keyed on
    (band_id, band_key); per-band bucket occupancy is O(1) by LSH
    design, so each stream row touches a bounded number of index
    rows. In this bounded replay the stream IS the indexed corpus, so
    self-matches are excluded in the join condition and a doc is
    near-dup iff some OTHER doc shares a band. The per-doc collision
    count is a complete-mode aggregate here (|docs| state under the
    AvailableNow drain); an unbounded deployment would watermark and
    emit per-batch appends instead — each doc's band rows arrive in
    one micro-batch, so the aggregation never spans batches."""
    from free_etl_spark.queries.dedup import _minhash_bands

    docs = documents_stream(spark, sf_dir)
    stream_bands = _stream_band_signatures(docs)
    idx = _minhash_bands(spark, sf_dir).select(
        F.col("doc_id").alias("idx_doc"),
        F.col("band_id").alias("idx_band"),
        F.col("band_key").alias("idx_key"),
    )
    joined = stream_bands.join(
        idx,
        (F.col("band_id") == F.col("idx_band"))
        & (F.col("band_key") == F.col("idx_key"))
        & (F.col("doc_id") != F.col("idx_doc")),
        "left",
    )
    agg = joined.groupBy("doc_id").agg(
        F.count(F.col("idx_doc")).alias("n_cand_hits")
    )
    out = agg.select(
        "doc_id",
        F.col("n_cand_hits").cast("long").alias("n_cand_hits"),
        (F.col("n_cand_hits") > 0).alias("is_neardup"),
    )
    return run_to_completion(out, "complete")
