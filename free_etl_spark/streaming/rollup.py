"""Continuously-maintained rollup (the streaming form of the
hypertable-style continuous aggregate in events_time_rollup): a
foreachBatch sink keeps a partitioned parquet rollup up to date as
event files land.

Exactly-once without transactions: each micro-batch writes its
*partial* aggregate into partitions keyed by (day, batch_id) with
dynamic partition overwrite. A batch replayed after crash/checkpoint
recovery rewrites exactly its own (day, batch_id) partitions with
identical content — idempotent by construction, no commit log, no
read-modify-write race. The serving view sums the partials per day
(a few rows per batch per day, negligible next to the events).
At 100 TB/day per-batch work is bounded by the batch itself; old
partials can be compacted into a single batch_id=-1 partition
offline without changing the view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.streaming.windows import events_stream


def rollup_batch(events: DataFrame) -> DataFrame:
    """Per-(day, event_type) partial aggregate of one batch."""
    return events.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def start_rollup_maintenance(
    spark: SparkSession,
    sf_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
):
    """Maintain ``rollup_dir`` from the event stream (AvailableNow
    drains what's currently there; leave the trigger off to tail)."""
    ev = events_stream(spark, sf_dir)

    def update(batch_df: DataFrame, batch_id: int) -> None:
        # dynamic overwrite scoped to THIS write via the per-writer
        # option (precedence over session conf, ADVICE r12): no shared
        # session-state mutation, no restore race with concurrent
        # writers in the same session.
        (
            rollup_batch(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "batch_id")
            .parquet(rollup_dir)
        )

    return (
        ev.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Serving view: merge the per-batch partials to the final per-day
    rollup (sums are re-associable; the round matches rollup_batch)."""
    partials = spark.read.parquet(rollup_dir)
    return partials.groupBy("day", "event_type").agg(
        F.sum("n").alias("n"),
        F.round(F.sum("sum_value"), 2).alias("sum_value"),
    )
