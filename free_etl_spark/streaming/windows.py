"""Structured Streaming event-window operators (SURVEY.md §2B
"streaming windows / watermark / session" rows): tumbling windows with
watermark, session windows, and watermark-scoped dedup over the events
table replayed as a file stream.

Each helper runs the stream to completion with Trigger.AvailableNow
against a memory sink and returns the final result as a batch
DataFrame — deterministic, so the tumbling-window variant doubles as
an oracle-checked queries() entry (it must equal the equivalent batch
GROUP BY).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.registry import query

_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def _events_ts_to_micros_expr(sf_dir: str) -> str:
    """SQL expression converting the stream's raw ``ts`` long to MICROS.

    The stream forces an explicit ``ts long`` schema, which surfaces
    the parquet column's *physical* int64 — whose unit depends on how
    the file was written and is known to change between dataset
    generations (NANOS in some rounds, MICROS in others). Read the
    column's *logical* type unit straight from the parquet footer
    (pyarrow) rather than inferring it from how a batch read happens
    to surface the column: a TIMESTAMP(MILLIS) int64 also reads back
    as ``timestamp`` in batch, which the old bigint/timestamp
    dichotomy would silently misclassify as micros (1000x off)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    path = f"{sf_dir}/events.parquet"
    if _os.path.isdir(path):  # dataset written as a directory of parts
        parts = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if not parts:
            raise ValueError(f"no parquet parts under {path}")
        path = parts[0]
    field = _pq.read_schema(path).field("ts")
    t = field.type
    unit = getattr(t, "unit", None)
    if unit == "ns":
        return "ts DIV 1000"
    if unit == "us":
        return "ts"
    if unit == "ms":
        return "ts * 1000"
    if unit == "s":
        return "ts * 1000000"
    raise ValueError(
        f"events.parquet ts column has unexpected type {t!r}; "
        "expected a timestamp logical type (ns/us/ms/s)"
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded file stream with the same ts
    normalization as tables.load_table (raw unit → µs → event-time)."""
    to_us = _events_ts_to_micros_expr(sf_dir)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The file stream source requires a *directory*; point it at sf_dir
    # and glob-filter to the single events table file.
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # watermarks require TimestampType (not NTZ): keep the event-time
    # column as a UTC instant here; output columns cast to NTZ so they
    # line up with the batch/oracle representation (session tz is UTC).
    return raw.withColumn("ts_us", F.expr(to_us)).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )


def run_to_completion(df: DataFrame, output_mode: str) -> DataFrame:
    """Drain a bounded stream into a memory sink (AvailableNow) and
    return the final table.

    The drain runs with a reduced shuffle-partition count (restored
    afterwards): stateful operators create one state-store instance
    per shuffle partition PER micro-batch, which dominates wall time
    on a bounded replay. This is a property of the test/replay drain
    only — a production unbounded stream keeps the session's partition
    count, sized to the cluster (state scales with partitions, and the
    partition count is fixed for the life of a stateful query)."""
    spark = df.sparkSession
    name = f"fes_stream_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@query(
    "streaming_hourly_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS event_cnt,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation executed as a Structured
    Streaming job (watermarked event time, AvailableNow trigger,
    complete-mode memory sink). Must produce exactly the batch GROUP BY
    result — which is the oracle."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("hour_start"),
        "event_type",
        "event_cnt",
        "sum_value",
    )


@query(
    "streaming_session_windows",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    m AS (SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts, value,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
    SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful session windows (30-min gap) per user over the event
    stream — the streaming analogue of events_sessionize. session_window
    semantics ARE SQL-expressible: a session breaks when the gap to the
    previous event is ≥ the 30-min gap duration, and the window end is
    the last event + gap — which is exactly what the oracle's
    lag/running-sum sessionization computes."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


@query(
    "streaming_dedup_watermark",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY user_id, event_type
    """,
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type). With a watermark ≥ the stream's full time
    range every duplicate is inside the state window, so the result
    equals a batch DISTINCT — which is the oracle."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "400 days")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    out = run_to_completion(deduped.select("user_id", "event_type", "ts"), "append")
    return out.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "streaming_sliding_windows",
    oracle="""
    SELECT win_start, event_type, COUNT(*) AS event_cnt,
           ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP))
                  + CASE WHEN minute(CAST(ts AS TIMESTAMP)) >= 30
                         THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
                  - s.off * INTERVAL 30 MINUTE AS TIMESTAMP) AS win_start,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1)) AS s(off)
    )
    GROUP BY 1, 2
    """,
)
def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 1-hour/30-minute windowed aggregation as a
    Structured Streaming job — each event lands in exactly two open
    windows, so the state store carries two window rows per
    (window, type) group until the watermark closes them. Same
    stream-equals-batch contract as streaming_hourly_counts: the
    oracle is the batch events_sliding_windows arithmetic."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    out = run_to_completion(agg, "complete")
    return out.select(
        F.col("window.start").cast("timestamp_ntz").alias("win_start"),
        "event_type",
        "event_cnt",
        "sum_value",
    )


@query(
    "streaming_approx_distinct_users",
    oracle="""
    SELECT win_start, event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS sketch_ok
    FROM (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS win_start,
             event_type, user_id
      FROM events
    )
    GROUP BY 1, 2
    """,
)
def streaming_approx_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct-user cardinality per tumbling hour per event type with
    a STREAMING HLL sketch (approx_count_distinct inside a watermarked
    windowed agg — mergeable sketch state per open window, the only
    cardinality shape an unbounded stream can afford: exact distinct
    would hold every user id in state forever). The emitted sketch
    estimate is gated against the batch-exact count computed on the
    same corpus — |approx − exact| must be within 5% (rsd default
    ~2.3%) — and the oracle pins that boolean TRUE for every window,
    the same within-tolerance contract agg_hll_sketch_union uses. At
    100 TB: state is one HLL register set per open (window, type)
    group, bounded by the watermark; the batch-exact side here is the
    TEST HARNESS, not part of the streaming plan."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )
    stream_out = run_to_completion(agg, "complete").select(
        F.col("window.start").cast("timestamp_ntz").alias("win_start"),
        "event_type",
        "approx_users",
    )
    from free_etl_spark.tables import load_table

    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("win_start"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    return exact.join(stream_out, ["win_start", "event_type"]).select(
        "win_start",
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.col("exact_users") * 0.05, F.lit(5.0))
        ).alias("sketch_ok"),
    )


@query(
    "streaming_trending_terms",
    oracle="""
    WITH wc AS (
      SELECT CAST(to_timestamp(6 * 3600 *
                    FLOOR(epoch(CAST(ts AS TIMESTAMP)) / (6 * 3600)))
                  AS TIMESTAMP) AS win_start,
             CAST(CAST(json_extract(props, '$.k') AS INT) % 20 AS INT)
               AS term,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT win_start, term, cnt, CAST(rn AS INT) AS rn FROM (
      SELECT win_start, term, cnt,
             ROW_NUMBER() OVER (PARTITION BY win_start
                                ORDER BY cnt DESC, term) AS rn
      FROM wc
    ) WHERE rn <= 3
    """,
)
def streaming_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending terms per 6-hour tumbling window as a Structured
    Streaming job: the 'term' is the event's props.k bucketed mod 20
    (a stand-in for a token/hashtag id), counted in a watermarked
    windowed aggregation; the top-3-per-window ranking runs as a
    batch projection over the completed stream output (ranking
    inside a live stream would need 'update'-mode sorting the sink
    can't express — the standard pattern is aggregate-in-stream,
    rank-at-read). State per window is bounded by the term
    vocabulary (20 here; at real vocab sizes a CMS-backed candidate
    filter caps it — see agg_heavy_hitters_cms). The per-window
    ranking window is bounded by the term count, never the corpus."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    term = (
        F.get_json_object(F.col("props"), "$.k").cast("int") % 20
    ).cast("int")
    agg = ev.groupBy(
        F.window("ts", "6 hours"), term.alias("term")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    out = run_to_completion(agg, "complete")
    from pyspark.sql import Window as W

    w = W.partitionBy("win_start").orderBy(
        F.col("cnt").desc(), F.col("term")
    )
    return (
        out.select(
            F.col("window.start").cast("timestamp_ntz").alias("win_start"),
            "term",
            "cnt",
        )
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "streaming_bitmap_distinct_users",
    oracle="""
    SELECT win_start, event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS bitmap_exact
    FROM (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS win_start,
             event_type, user_id
      FROM events
    )
    GROUP BY 1, 2
    """,
)
def streaming_bitmap_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT distinct users per tumbling hour in a stream, via the
    bitmap aggregate family (bitmap_construct_agg over
    bitmap_bit_position, keyed by (window, type, bitmap bucket)) —
    the exact counterpart to streaming_approx_distinct_users' HLL:
    state per open group is a CONSTANT 4KB mergeable bitmap instead
    of an unbounded set of raw user ids, which is what makes exact
    streaming distinct affordable at all. The per-bucket partial
    counts are rolled up to (window, type) AFTER the stream
    completes (batch view over the emitted table — chained stateful
    aggregations stay out of the streaming plan); the result must
    EQUAL the batch COUNT(DISTINCT), not merely approximate it, and
    the oracle pins that equality via the n_users value itself plus
    the bitmap_exact flag."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(
        F.window("ts", "1 hour"),
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))")
        .alias("c")
    )
    emitted = run_to_completion(agg, "complete")
    per_window = emitted.groupBy(
        F.col("window.start").cast("timestamp_ntz").alias("win_start"),
        "event_type",
    ).agg(F.sum("c").cast("long").alias("stream_users"))
    from free_etl_spark.tables import load_table

    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("win_start"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
    return exact.join(per_window, ["win_start", "event_type"]).select(
        "win_start",
        "event_type",
        "n_users",
        (F.col("stream_users") == F.col("n_users")).alias("bitmap_exact"),
    )
