"""Similarity search over the embeddings table (north-star extension —
SURVEY.md §2B "similarity search").

- sim_cosine_topk: brute-force cosine top-k — the exactness baseline.
  The query side is tiny and broadcast; the candidate scan is a single
  map-side pass, so even brute force parallelizes linearly (the 100 TB
  constraint is the per-query candidate volume, addressed by LSH).
- sim_ann_lsh: bucketed random-projection LSH (MLlib) approximate
  neighbor pairs — the scale path (candidates only within matching
  hash buckets). Hash planes are engine-specific → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table

_K = 10
_N_QUERIES = 5


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             SQRT(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ), q AS (SELECT * FROM n WHERE vec_id < {_N_QUERIES}),
    p AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             ROUND(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                   z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                   / (q.nrm * c.nrm), 6) AS cosine
      FROM q JOIN n c ON q.vec_id <> c.vec_id
    )
    SELECT qid, cid, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT qid, cid, cosine,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
          FROM p)
    WHERE rn <= {_K}
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a small query set (ids < 5)."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    n = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = n.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "c_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = F.round(dot / (F.col("q_nrm") * F.col("c_nrm")), 6)
    pairs = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _K)
    )


@query("sim_ann_lsh")  # rows-only: LSH hash planes are engine-specific
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate similarity join via BucketedRandomProjectionLSH
    (fixed seed → deterministic): near pairs within euclidean distance
    1.15 — on L2-normalized embeddings that is cosine ≥ ~0.34. Candidates
    are generated only within matching hash buckets, which is what
    makes this the 100 TB path vs the O(n²) exact join."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=3,
        seed=42,
    )
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, 1.15, distCol="euclidean")
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("euclidean", 6).alias("euclidean"),
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
    )
