"""Incremental rollup maintenance — the batch "continuous aggregate"
(hypertable-style): a materialized time-bucket rollup that refreshes
from an append batch by recomputing ONLY the buckets the batch
touches, never the whole history.

The maintained invariant: after ``refresh_rollup``, the target equals
``build_rollup`` over the full event history (asserted by the test
suite). Cost per refresh is O(batch + touched-bucket history read),
independent of total history size — with the rollup partitioned by
bucket, the touched-bucket rewrite is a dynamic partition overwrite,
the same contract as operators/merge.py.

Additive aggregates (count/sum) could refresh from the batch alone
(old + delta); min/max/distinct cannot. Recomputing touched buckets
from the raw slice handles every aggregate uniformly and keeps the
refresh idempotent (re-running the same batch converges), which is
what a recovering pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucketed(events: DataFrame, bucket: str) -> DataFrame:
    return events.withColumn(
        "bucket_start", F.date_trunc(bucket, F.col("ts")).cast("timestamp_ntz")
    )


def build_rollup(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Full rollup: per (bucket_start, event_type) counts and value
    stats. The shape ``refresh_rollup`` maintains incrementally."""
    return (
        _bucketed(events, bucket)
        .groupBy("bucket_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("value").alias("max_value"),
        )
    )


def refresh_rollup(
    spark: SparkSession,
    target_dir: str,
    all_events: DataFrame,
    batch: DataFrame,
    bucket: str = "hour",
) -> int:
    """Refresh the materialized rollup at ``target_dir`` for an
    appended ``batch``: recompute exactly the buckets the batch
    touches from ``all_events`` (post-append history) and overwrite
    only those partitions. Returns the number of buckets refreshed.

    ``all_events`` is the full table the batch now belongs to; the
    scan of it is bucket-pruned by the touched-bucket filter, so with
    time-partitioned storage the read is partition-pruned too."""
    touched = (
        _bucketed(batch, bucket).select("bucket_start").distinct()
    )
    n_touched = touched.count()
    if n_touched == 0:
        return 0
    slice_df = _bucketed(all_events, bucket).join(
        F.broadcast(touched), "bucket_start", "left_semi"
    )
    refreshed = build_rollup(slice_df.drop("bucket_start"), bucket)
    # dynamic partition overwrite scoped to THIS write via the
    # per-writer option, which takes precedence over the session conf
    # (ADVICE r12): no save/set/restore of shared session state, so a
    # concurrent writer in the same session never observes "dynamic"
    # and there is no interleaved-restore race.
    out = refreshed.localCheckpoint(eager=True)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_start")
        .parquet(target_dir)
    )
    return n_touched
