"""Partitioning strategies for 100 TB joins (SURVEY.md §2B scale
notes): bucketed co-located joins and salted skew joins.

These are the two knobs AQE can't fully supply:

- **Bucketing** pre-shuffles *at write time*: two tables bucketed on
  the join key with the same bucket count sort-merge-join with ZERO
  runtime Exchange — the win compounds when a hot fact table is joined
  repeatedly (each query saves its shuffle). `write_bucketed` +
  `read_bucketed_join` below; the no-Exchange property is asserted in
  tests/test_partitioning.py.

- **Salting** handles the skew AQE's split-threshold misses or that
  lands in aggregations: the skewed side's key is widened with a
  deterministic salt in [0, n); the other side is replicated n×. The
  join result is identical to the unsalted join, but each hot key's
  rows spread over n reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets lets the sort-merge join skip its
    sort as well — scan → zip-merge, no Exchange, no Sort."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed_join(
    spark, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket columns.
    With matching bucket counts Spark plans a sort-merge join whose
    children read buckets directly (no Exchange)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed[on]`` has hot keys: spread each key
    over ``n_salts`` reducers.

    The skewed side computes ``salt = pmod(hash(<whole row id-ish>), n)``
    — here a random-free deterministic spread via
    ``monotonically_increasing_id`` is wrong across retries, so we hash
    the row's own columns; any per-row-varying expression works. The
    other side is replicated n× with ``explode(sequence(...))``. Join
    keys become (key, salt). Result ≡ plain join (verified in tests)
    — but only for join types where unmatched OTHER-side rows are
    dropped: the replication means a right/full outer join would emit
    each unmatched right row once per salt, so those are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the non-skewed side "
            "is replicated n_salts times, so right/full outer joins would "
            "duplicate unmatched right rows (one per salt). Supported: "
            "inner, left, left_semi, left_anti."
        )
    skew_salt = F.pmod(
        F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).alias("__salt")
    left = skewed.select("*", skew_salt)
    right = other.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")


def salted_count_by_key(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group-by keys: partial count on
    (key, salt), then final on key. Same result as a direct count;
    the hot key's partials spread over ``n_salts`` reducers first."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return (
        df.groupBy(F.col(key), salt.alias("__salt"))
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("n"))
    )
