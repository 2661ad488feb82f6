"""Watermarked stream-stream join (SURVEY.md §2B streaming rows): the
streaming analogue of the batch temporal interval join — purchases
joined to the same user's clicks in the preceding 5 minutes, both
sides replayed as file streams.

Inner stream-stream joins emit each matched pair exactly once as
matches become possible, so on a bounded stream the union of emissions
equals the batch inner join — which (aggregated per purchase) is the
DuckDB oracle. Watermarks bound the join state: each side keeps only
rows inside watermark ± the join's time band, which is what makes
state finite on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.streaming.windows import events_stream, run_to_completion


@query(
    "streaming_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(*) AS clicks_before,
           ROUND(SUM(c.value), 2) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 300000000
     AND epoch_us(CAST(c.ts AS TIMESTAMP)) <  epoch_us(CAST(p.ts AS TIMESTAMP))
    GROUP BY p.event_id, p.user_id
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides and a
    time-band condition; matched pairs drain to a memory sink and are
    aggregated per purchase (inner join ⇒ purchases with no preceding
    click don't appear, same as the oracle's inner join)."""
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("value").alias("c_value"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    pairs = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 5 minutes"))
        & (clicks.c_ts < purchases.p_ts),
        "inner",
    )
    out = run_to_completion(
        pairs.select("purchase_id", "user_id", "c_value"), "append"
    )
    return out.groupBy("purchase_id", "user_id").agg(
        F.count(F.lit(1)).alias("clicks_before"),
        F.round(F.sum("c_value"), 2).alias("click_value"),
    )


@query(
    "streaming_static_enrich",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY c.c_mktsegment
    """,
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the most common production
    streaming shape: an unbounded event stream joined to a slowly
    changing dimension table read as a plain batch DataFrame. The
    static side needs no watermark and is re-read per micro-batch
    (which is what picks up dimension updates); Spark broadcasts it
    when small. The drained result must equal the batch join+aggregate
    (the oracle)."""
    from free_etl_spark.tables import load_table

    ev = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(cust, "user_id").select("c_mktsegment", "value")
    out = run_to_completion(enriched, "append")
    return out.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "streaming_interval_join_left_outer",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(COUNT(c.user_id) AS BIGINT) AS clicks_before,
           ROUND(COALESCE(SUM(c.value), 0), 2) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 300000000
     AND epoch_us(CAST(c.ts AS TIMESTAMP)) <  epoch_us(CAST(p.ts AS TIMESTAMP))
    GROUP BY p.event_id, p.user_id
    """,
)
def streaming_interval_join_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER stream-stream join — the state-eviction half the
    inner join never exercises: a purchase with no preceding click
    must still emit (null-padded), and it can ONLY emit when the
    watermark passes its eviction point, because until then a matching
    click could still arrive. On a bounded replay the watermark stalls
    at max(ts) - delay, permanently trapping the last delay-window of
    purchases in state (measured: 2 of 202 purchases never emitted at
    sf0.001) — the same stall an idle production source causes. The
    production fix is a WATERMARK HEARTBEAT: a sentinel event past the
    horizon that advances the watermark without joining to anything
    (user_id -1 never matches; filtered from the result). With the
    heartbeat, drained-stream = batch left join exactly, which is the
    oracle.

    State note: each side keeps only watermark ± band (10 min + 5 min
    here), so state is bounded by traffic in the band, not stream
    length — the property that makes this run forever at 100 TB/day.
    """
    import os

    from free_etl_spark.tables import load_table

    # ONE tiny heartbeat parquet (a single row past the horizon) is
    # unioned into BOTH stream sides — the events stream itself is the
    # untouched events_stream file source, so the fixture cost is one
    # bounded max(ts) lookup + a 1-row write, not a copy of events.
    hb_dir = os.path.join(
        "/tmp",
        f"fes_sswm_hb_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{spark.sparkContext.applicationId}",
    )
    if not os.path.exists(os.path.join(hb_dir, "_SUCCESS")):
        # heartbeat instant from ts_us (the same micro-second basis
        # events_stream emits) — NOT a session-tz NTZ cast, which on a
        # non-UTC vanilla session would shift the heartbeat by the tz
        # offset and re-trap the tail in state
        (
            load_table(spark, sf_dir, "events")
            .agg(F.timestamp_micros(F.max("ts_us")).alias("m"))
            .select(
                F.lit(-1).cast("long").alias("event_id"),
                (F.col("m") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.lit(0.0).alias("value"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(hb_dir)
        )
    hb_schema = "event_id long, ts timestamp, user_id long, value double"
    heartbeat = spark.readStream.schema(hb_schema).parquet(hb_dir)
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .unionByName(heartbeat.select("event_id", "user_id", "ts"))
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "value", "ts")
        .unionByName(heartbeat.select("user_id", "value", "ts"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("value").alias("c_value"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    pairs = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 5 minutes"))
        & (clicks.c_ts < purchases.p_ts),
        "left_outer",
    )
    out = run_to_completion(
        pairs.select("purchase_id", "user_id", "c_value"), "append"
    ).filter(F.col("user_id") >= 0)
    return out.groupBy("purchase_id", "user_id").agg(
        F.count("c_value").cast("long").alias("clicks_before"),
        F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 2).alias("click_value"),
    )
