"""Shared embedding-vector building blocks for the similarity/dedup
family. Every consumer's DuckDB oracle replays these EXACT semantics
(fold order, 6-dp rounding, the (distance, cent_id) tie-break), so a
change here must be mirrored in each oracle — which is the point of
having one implementation instead of four copies.

All expressions are JVM-side higher-order functions (zip_with +
aggregate folds); no Python stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def l2_sq(a: str, b: str) -> F.Column:
    """Σ (a_i - b_i)² as a left-to-right fold (matches list_sum of
    list_transform in the oracles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(col: str = "emb") -> F.Column:
    """Euclidean norm of an array<double> column."""
    return F.sqrt(F.aggregate(F.col(col), F.lit(0.0), lambda a, x: a + x * x))


def centroid_rank(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Distance of every vector to every centroid, ranked per vector:
    (vec_id, cent_id, d2, rn) with rn = 1 the nearest centroid.

    ``cents`` is broadcast (the coarse codebook is small by
    construction), so the cross join is map-side; ties break on
    cent_id — the rule every oracle replays. Callers filter
    ``rn == 1`` for assignment or ``rn <= nprobe`` for probing.
    ``vecs``: (vec_id, emb); ``cents``: (cent_id, cemb)."""
    return (
        vecs.join(F.broadcast(cents))
        .select("vec_id", "cent_id", l2_sq("emb", "cemb").alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("d2", "cent_id")),
        )
    )


def cosine_scored_pairs(
    cand: DataFrame, emb: DataFrame, left: str = "vec_a", right: str = "vec_b"
) -> DataFrame:
    """Attach exact cosine (rounded to 6 dp, the oracle contract) to
    candidate id pairs: two joins keyed on the pair ids carry each
    side's embedding + norm onto the (few) candidate rows — cost is
    O(|cand|), never corpus².

    ``cand``: (left, right); ``emb``: (vec_id, emb). Returns
    (left, right, cosine)."""
    n = emb.select("vec_id", "emb", norm("emb").alias("nrm"))
    na = n.select(
        F.col("vec_id").alias(left),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    nb = n.select(
        F.col("vec_id").alias(right),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = F.round(dot / (F.col("nrm_a") * F.col("nrm_b")), 6)
    return (
        cand.join(na, left)
        .join(nb, right)
        .select(left, right, cosine.alias("cosine"))
    )
