"""Custom stateful streaming operator (SURVEY.md §2B "stateful dedup /
late data" row, applyInPandasWithState variant): per-user running
aggregates with explicit GroupState, the shape used for custom session
logic / online features that windowed aggs can't express.

State is one (count, sum) tuple per user_id. Each micro-batch the
operator folds its pandas chunks into the state and emits the updated
running totals (update mode). Because emissions are cumulative and
monotone, the *final* value per user — recovered with a max() over the
memory-sink rows — equals the batch GROUP BY, which is the oracle; the
check holds regardless of how AvailableNow slices micro-batches.

Scale: state lives in the state store partitioned by user_id (RocksDB
on a real cluster); each micro-batch shuffles only its own rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from free_etl_spark.registry import query
from free_etl_spark.streaming.windows import events_stream, run_to_completion

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, total double"


def _running_totals(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [total]}
    )


@query(
    "streaming_stateful_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running per-user totals over the event
    stream; final per-user emission must equal the batch GROUP BY."""
    ev = events_stream(spark, sf_dir).select("user_id", "value")
    updates = ev.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_completion(updates, "update")
    # n_events strictly increases per emission → the struct-max picks
    # the final (n_events, sum_value) pair even if values were negative
    final = F.max(F.struct("n_events", "sum_value")).alias("f")
    return (
        out.groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("f.n_events").alias("n_events"),
            F.round(F.col("f.sum_value"), 2).alias("sum_value"),
        )
    )


@query(
    "streaming_cdc_upsert",
    oracle="""
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           ROUND(value, 2) AS last_value,
           CAST(ts AS TIMESTAMP) AS last_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
                                            event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming lakehouse upsert: a change stream applied to a
    parquet target via foreachBatch + conditional keep-newest MERGE
    (operators/merge.upsert_latest_parquet). The target is seeded with
    a compacted snapshot of half the log (even event_ids), the stream
    replays the other half, and because the merge keeps the per-key
    max (ts, event_id) it is order-insensitive — any batch slicing or
    replay converges to the same table, which must equal the global
    latest-per-key compaction (the oracle). This is the foreachBatch
    materialized-upsert pattern a production CDC sink uses when no
    transactional table format is available. Gate cost is dominated
    by fixed micro-batch machinery (2 real triggers + checkpoint +
    per-batch parquet rewrite), not plan cost — it does not grow
    with sf. Measured per-batch constant ~0.5 s (r10: 4-batch vs
    2-batch replay diff at sf0.1); 2 batches keep the multi-batch
    convergence property at half the harness cost."""
    import os
    import shutil

    from free_etl_spark.operators.merge import upsert_latest_parquet
    from free_etl_spark.tables import load_table

    target = (
        f"/tmp/fes_cdc_upsert_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(target, ignore_errors=True)  # idempotent re-run

    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    # seed: latest-per-key snapshot of the even half of the log
    seed = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select(*cols)
        .filter(F.col("event_id") % 2 == 0)
    )
    upsert_latest_parquet(spark, target, seed, ["user_id"], ["ts", "event_id"])

    # change stream: the odd half, laid out as 2 parquet files and
    # replayed with maxFilesPerTrigger=1 so the apply loop runs over
    # separate micro-batches (each carrying an arbitrary slice of
    # each key's history) — the order-insensitive merge must still
    # converge to the global latest-per-key
    changes_dir = f"{target}_changes"
    changes = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select(*cols)
        .filter(F.col("event_id") % 2 == 1)
    )
    changes.repartition(2).write.mode("overwrite").parquet(changes_dir)
    ev = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
    )

    n_batches = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        n_batches.append(batch_id)
        upsert_latest_parquet(
            spark, target, batch_df, ["user_id"], ["ts", "event_id"]
        )

    q = (
        ev.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(n_batches) >= 2, n_batches  # genuinely multi-batch

    final = spark.read.parquet(target)
    return final.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 2).alias("last_value"),
        F.col("ts").cast("timestamp_ntz").alias("last_ts"),
    )


@query(
    "streaming_cdc_with_deletes",
    oracle="""
    WITH seed AS (
      SELECT user_id, event_id, ts, event_type, value, FALSE AS is_del,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
                                         event_id DESC) AS rn
      FROM events WHERE event_id % 2 = 0
    ),
    allr AS (
      SELECT user_id, event_id, ts, event_type, value, is_del
      FROM seed WHERE rn = 1
      UNION ALL
      SELECT user_id, event_id, ts, event_type, value,
             (event_id % 10 = 5) AS is_del
      FROM events WHERE event_id % 2 = 1
    ),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
                                            event_id DESC) AS rn2
      FROM allr
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           ROUND(value, 2) AS last_value, CAST(ts AS TIMESTAMP) AS last_ts
    FROM latest WHERE rn2 = 1 AND NOT is_del
    """,
)
def streaming_cdc_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with BOTH change kinds: the odd-event_id half of the
    log replays as op∈{upsert, delete} micro-batches (delete iff
    event_id % 10 = 5) against a target seeded with the latest-per-key
    even snapshot — the half of CDC (deletes) most likely to corrupt a
    real mirror, exercised as real foreachBatch micro-batches.

    Delete semantics: TOMBSTONE RETENTION + terminal compaction (the
    Kafka-compacted-topic / Delta pattern). Each micro-batch feeds the
    SAME keep-newest merge with is_del carried as a column, so a
    delete participates in (ts, event_id) recency exactly like an
    upsert — physically removing the key inside the batch loop is
    provably wrong on a plain-parquet mirror, because a later batch
    can carry an OLDER upsert for the key and the merge would
    resurrect it (observed: +7 phantom keys at sf0.01 before the
    tombstones). The stream drained, one operators/merge.apply_deletes
    pass compacts every tombstoned key out of the mirror. Because the
    merge is order/replay-insensitive and compaction is terminal, ANY
    batch slicing or checkpoint-recovery replay converges to the
    op-aware global latest per key — present iff the newest of
    {seed row, all changes} is an upsert — exactly what the oracle
    compacts. Scale: each micro-batch is one partition-scoped merge;
    the compaction is one anti-join rewrite.

    Gate cost is the maxFilesPerTrigger=1 harness: 2 genuine
    micro-batch replays (per-batch constant ~0.55 s measured r10),
    each paying streaming-query start/commit latency, plus the seed write and terminal
    compaction — fixed per-run overhead that does not grow with data
    volume (a production stream amortizes start-up across an
    unbounded run)."""
    import os
    import shutil

    from pyspark.sql import Window

    from free_etl_spark.operators.merge import (
        apply_deletes,
        upsert_latest_parquet,
    )
    from free_etl_spark.tables import load_table

    target = (
        f"/tmp/fes_cdc_del_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(target, ignore_errors=True)

    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    seed = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select(*cols)
        .filter(F.col("event_id") % 2 == 0)
        .withColumn("is_del", F.lit(False))
    )
    upsert_latest_parquet(spark, target, seed, ["user_id"], ["ts", "event_id"])

    changes_dir = f"{target}_changes"
    changes = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select(*cols)
        .filter(F.col("event_id") % 2 == 1)
        .withColumn("is_del", F.col("event_id") % 10 == 5)
    )
    changes.repartition(2).write.mode("overwrite").parquet(changes_dir)
    ev = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
    )

    n_batches: list[int] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        n_batches.append(batch_id)
        apply_cdc_batch(spark, target, batch_df)

    q = (
        ev.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(n_batches) >= 2, n_batches  # genuinely multi-batch

    compact_cdc_tombstones(spark, target)
    final = spark.read.parquet(target)
    return final.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 2).alias("last_value"),
        F.col("ts").cast("timestamp_ntz").alias("last_ts"),
    )


def apply_cdc_batch(
    spark: SparkSession,
    target: str,
    batch_df: DataFrame,
) -> None:
    """Apply one op-tagged CDC micro-batch (is_del column) to a
    parquet mirror — exposed for the recovery test. A delete is a
    TOMBSTONE ROW through the same keep-newest (ts, event_id) merge
    as an upsert, so recency arbitration is uniform and replay-safe;
    physical removal is deferred to compact_cdc_tombstones."""
    from free_etl_spark.operators.merge import upsert_latest_parquet

    upsert_latest_parquet(
        spark, target, batch_df, ["user_id"], ["ts", "event_id"]
    )


def compact_cdc_tombstones(spark: SparkSession, target: str) -> int:
    """Terminal compaction: physically remove every key whose CURRENT
    mirror row is a tombstone (operators/merge.apply_deletes — the
    right-to-be-forgotten rewrite). Returns rows removed."""
    from free_etl_spark.operators.merge import apply_deletes

    doomed = (
        spark.read.parquet(target).filter(F.col("is_del")).select("user_id")
    )
    return apply_deletes(spark, target, doomed, ["user_id"])


@query(
    "streaming_mv_refresh",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental materialized-view maintenance: the
    per-(type, hour) aggregate MV is seeded from the even half of the
    log, then the odd half replays as TWO real micro-batches
    (maxFilesPerTrigger=1); each batch's delta aggregate merges into
    the stored MV via the additive partial-state merge
    (operators/merge.merge_additive_parquet). Count/sum are
    associative and commutative, so ANY batch slicing converges to
    the full recompute — which is the oracle.

    Replay safety: additive merges are NOT idempotent (a recovery
    replay would double-count), so each applied batch_id is recorded
    as a marker file and replayed batches are skipped — the
    batch-id-dedup contract foreachBatch requires for non-idempotent
    sinks. A transactional table format would make marker+merge
    atomic; on plain parquet the marker lands after the merge,
    narrowing (not closing) the crash window — documented trade.

    Gate cost is fixed micro-batch machinery (2 triggers + checkpoint
    + per-batch MV rewrite), volume-independent (~0.4 s/batch
    measured r10); each delta aggregate shuffles only its batch, and
    the merge join is MV-sized."""
    import os
    import shutil

    from free_etl_spark.operators.merge import merge_additive_parquet
    from free_etl_spark.tables import load_table

    target = (
        f"/tmp/fes_mv_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(f"{target}_applied", ignore_errors=True)
    shutil.rmtree(f"{target}_changes", ignore_errors=True)

    def mv_agg(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("value_sum"),
        )

    ev_all = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    seed = ev_all.filter(F.col("event_id") % 2 == 0)
    merge_additive_parquet(
        spark, target, mv_agg(seed), ["event_type", "hr"],
        ["n_events", "value_sum"],
    )

    changes = ev_all.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "ts", "event_type", "value"
    )
    changes_dir = f"{target}_changes"
    changes.repartition(2).write.mode("overwrite").parquet(changes_dir)
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(changes_dir)
    )

    applied_dir = f"{target}_applied"
    n_batches = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from free_etl_spark.operators.merge import merge_additive_once

        ran = merge_additive_once(
            spark,
            target,
            mv_agg(batch_df),
            ["event_type", "hr"],
            ["n_events", "value_sum"],
            applied_dir,
            batch_id,
        )
        if ran:
            n_batches.append(batch_id)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(n_batches) >= 2, n_batches  # genuinely multi-batch

    final = spark.read.parquet(target)
    return final.select(
        "event_type",
        "hr",
        "n_events",
        F.round("value_sum", 2).alias("value_sum"),
    )
