"""Python UDF surface (SURVEY.md §2B "UDF/UDAF surface"): the four
Arrow-batched shapes — scalar pandas_udf, grouped-agg pandas_udf,
applyInPandas (grouped map), mapInPandas (partition map).

These exist to prove the *plumbing*; each one's logic is chosen to be
SQL-expressible so the DuckDB oracle can validate the Arrow round-trip
(dtype preservation, null handling, batch boundaries) — in real use
the body would be the thing Spark can't express (a model forward pass,
a tokenizer, a custom sketch).

pandas_udf construction happens inside each query function (not at
module import): the decorator resolves its return type against the
active SparkSession, which doesn't exist yet at registry-import time.

Scale notes: all four shapes move data JVM→Python as Arrow record
batches (spark.sql.execution.arrow.maxRecordsPerBatch), never per-row
pickling. The grouped shapes shuffle on the group key first — at
100 TB the group cardinality must exceed executor-core count or the
pandas step serializes on stragglers (event_type×5 here is fine only
because the demo data is small; production keys are user_id-grained).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "udf_pandas_scalar_price",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_effective,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_pandas_scalar_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized, one call per batch) feeding
    a JVM aggregate — the hybrid pattern: Python only for the scalar
    step, shuffle/agg stay JVM-side."""

    @pandas_udf("double")
    def effective_price(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # vectorized numpy arithmetic over one Arrow batch
        return ext * (1.0 - disc) * (1.0 + tax)

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "eff", effective_price(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("eff"), 2).alias("sum_effective"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "udf_grouped_agg_weighted",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_discount * l_quantity) / SUM(l_quantity), 6) AS w_avg_disc
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udf_grouped_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (custom UDAF): quantity-weighted
    mean discount per (returnflag, linestatus). Whole group's columns
    arrive as one pandas Series per group."""

    @pandas_udf("double")
    def weighted_avg_disc(disc: pd.Series, qty: pd.Series) -> float:
        return float((disc * qty).sum() / qty.sum())

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(weighted_avg_disc(F.col("l_discount"), F.col("l_quantity")).alias("w_raw"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("w_raw", 6).alias("w_avg_disc"),
        )
    )


_ZSCORE_SCHEMA = "event_id bigint, event_type string, z double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)  # sample stddev ≡ SQL stddev_samp
    out = pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z": (pdf["value"] - mu) / sd,
        }
    )
    return out[out["z"].abs() > 2.0]


@query(
    "udf_apply_in_pandas_zscore",
    oracle="""
    SELECT event_id, event_type, ROUND(z, 4) AS z
    FROM (
      SELECT event_id, event_type,
             (value - AVG(value) OVER (PARTITION BY event_type))
               / STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS z
      FROM events
    )
    WHERE ABS(z) > 2.0
    """,
)
def udf_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped map): per-event-type outlier detection —
    each group materializes as one pandas DataFrame in Python, returns
    an arbitrary-shaped frame (here: filtered |z|>2)."""
    ev = _t(spark, sf_dir, "events")
    out = ev.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        _zscore_group, _ZSCORE_SCHEMA
    )
    return out.select("event_id", "event_type", F.round("z", 4).alias("z"))


_ENRICH_SCHEMA = "event_id bigint, k bigint, k_sq bigint"


def _enrich_batches(batches):
    for pdf in batches:
        k = pdf["props"].str.extract(r'"k": (\d+)')[0].astype("int64")
        keep = k > 90
        yield pd.DataFrame(
            {"event_id": pdf["event_id"][keep], "k": k[keep], "k_sq": (k * k)[keep]}
        )


@query(
    "udf_map_in_pandas_enrich",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT)
             * CAST(json_extract(props, '$.k') AS BIGINT) AS k_sq
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 90
    """,
)
def udf_map_in_pandas_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (partition map): batch-wise parse + filter + derive
    — the shape used for tokenizers/model inference, where output rows
    need not align 1:1 with input rows. No shuffle at all: the Python
    stage runs inside the scan stage."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", "props").mapInPandas(_enrich_batches, _ENRICH_SCHEMA)


@query(
    "udf_python_udtf_chunks",
    oracle="""
    SELECT doc_id, CAST((s - 1) // 10 AS INT) AS pos,
           array_to_string(string_split(text, ' ')[s:s+9], ' ') AS chunk,
           CAST(LEN(string_split(text, ' ')[s:s+9]) AS INT)     AS n_tokens
    FROM documents,
         LATERAL (SELECT unnest(range(1, len(string_split(text, ' ')) + 1,
                                      10)) AS s)
    WHERE doc_id % 20 = 0
    """,
)
def udf_python_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, the one-row-in/N-rows-out UDF shape
    added in Spark 3.5/4.x): each document expands to its 10-token
    chunks via a lateral join against the UDTF. Like the other udf_*
    queries this proves the plumbing with SQL-expressible logic (the
    oracle replays the chunker relationally); a real body would be a
    tokenizer or sentence splitter. Scale note: UDTFs execute in the
    Python worker per input row — keep them off the hot path (the
    relational chunker in text_boilerplate_lines does this same job
    JVM-side); the doc_id % 20 filter is pushed below the lateral
    join, so the UDTF only sees the sampled rows."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, chunk string, n_tokens int")
    class ChunkSplit:
        def eval(self, text: str, width: int):
            toks = text.split(" ")
            for i in range(0, len(toks), width):
                piece = toks[i : i + width]
                yield i // width, " ".join(piece), len(piece)

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
    )
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("chunk_split", ChunkSplit)
    return spark.sql(
        "SELECT doc_id, c.pos, c.chunk, c.n_tokens "
        "FROM udtf_docs_in, LATERAL chunk_split(text, 10) AS c"
    )


@query(
    "udf_map_in_arrow_stats",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS BIGINT) AS dims,
           ROUND(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS vmin,
           ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vmax,
           ROUND((CAST(list_aggregate(embedding, 'max') AS DOUBLE)
                - CAST(list_aggregate(embedding, 'min') AS DOUBLE)) / 255.0, 6)
             AS int8_scale
    FROM embeddings
    """,
)
def udf_map_in_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (the fifth Python-surface shape: raw Arrow
    RecordBatch in/out, no pandas conversion) computing per-vector
    min/max and the asymmetric-int8 quantization scale. The body works
    directly on the Arrow list array's buffers — ``values`` +
    ``offsets`` → ``np.minimum.reduceat`` — zero per-row Python and
    zero pandas boxing, the cheapest possible Python hop for numeric
    array columns at 100 TB. min/max are order statistics, so
    computing them on the raw float32 values then widening to float64
    gives bit-identical results to the oracle's widen-then-aggregate."""
    import pyarrow as pa

    def vec_stats(batches):
        import numpy as np

        for batch in batches:
            emb = batch.column(batch.schema.get_field_index("embedding"))
            if isinstance(emb, pa.ChunkedArray):  # pragma: no cover
                emb = emb.combine_chunks()
            offsets = emb.offsets.to_numpy()
            values = emb.values.to_numpy(zero_copy_only=False)
            dims = np.diff(offsets).astype("int64")
            # reduceat segments = list boundaries (ragged-safe)
            starts = offsets[:-1].astype("int64")
            vmin = np.minimum.reduceat(values, starts).astype("float64")
            vmax = np.maximum.reduceat(values, starts).astype("float64")
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": batch.column(
                        batch.schema.get_field_index("vec_id")
                    ),
                    "dims": pa.array(dims, pa.int64()),
                    "vmin": pa.array(np.round(vmin, 6), pa.float64()),
                    "vmax": pa.array(np.round(vmax, 6), pa.float64()),
                    "int8_scale": pa.array(
                        np.round((vmax - vmin) / 255.0, 6), pa.float64()
                    ),
                }
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(
        vec_stats,
        "vec_id bigint, dims bigint, vmin double, vmax double, int8_scale double",
    )


@query(
    "udf_arrow_python_scalar",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'S'
                WHEN o_totalprice < 250000 THEN 'M'
                WHEN o_totalprice < 400000 THEN 'L'
                ELSE 'XL' END AS tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1
    """,
)
def udf_arrow_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4's `useArrow=True` on a
    plain @udf) — the third Python-scalar surface next to
    pandas_udf (Arrow, batch Series) and legacy row-pickle udf
    (deliberately absent from this repo): same per-row Python
    function author experience, but Arrow batch transfer instead of
    pickled rows. The UDF computes only the tier label; the
    aggregate stays JVM-side. Exists to pin API parity — for a pure
    banding expression the built-in CASE (see the oracle) is the
    production form, which is why every OTHER banding query here is
    pure JVM."""
    from pyspark.sql.functions import udf

    @udf("string", useArrow=True)
    def tier(p: float) -> str:
        if p < 100000:
            return "S"
        if p < 250000:
            return "M"
        if p < 400000:
            return "L"
        return "XL"

    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("tier", tier(F.col("o_totalprice")))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
