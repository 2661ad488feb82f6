"""Window functions: rank/row_number, running frames, lag/lead,
per-group top-k. All built-in Spark window expressions (single shuffle
on the partition key each). (SURVEY.md §2B.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table


@query(
    "window_rank_acctbal",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS bal_rank,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
    FROM customer
    """,
)
def window_rank_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK (deterministic under ties) + ROW_NUMBER (tie-broken by key)
    within market segment."""
    cust = load_table(spark, sf_dir, "customer")
    w_rank = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    w_rn = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w_rank).cast("long").alias("bal_rank"),
        F.row_number().over(w_rn).cast("long").alias("rn"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (explicit ROWS frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS next_value
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event value per user in time order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number window + filter. At scale
    this is the canonical per-group top-k (window with rank-limit
    pushdown in AQE; no driver collect)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_ntile_movavg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS price_quartile,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS movavg3
    FROM orders
    """,
)
def window_ntile_movavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing + bounded moving-average frame. The quartile is
    a GLOBAL ntile over the orders FACT table — the one place a bare
    ``F.ntile`` would sort the whole corpus in a single task — so it
    uses operators.prefix.global_ntile: range-partitioned global row
    number + closed-form NTILE bucket assignment, value-identical to
    the oracle's NTILE(4) (unique (price, orderkey) tie-break) with
    no single-partition window exchange in the plan."""
    from free_etl_spark.operators.prefix import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    ranked = global_ntile(
        orders,
        [F.col("o_totalprice"), F.col("o_orderkey")],
        4,
        "__q4",
        cache_tag="ntile_movavg",
    )
    w_mov = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return ranked.select(
        "o_orderkey",
        "o_custkey",
        F.col("__q4").cast("long").alias("price_quartile"),
        F.round(F.avg("o_totalprice").over(w_mov), 4).alias("movavg3"),
    )


@query(
    "window_range_frame_30d",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d,
           ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per customer, orders and spend in
    the trailing 30 days. Spark range frames need a numeric ordering
    column → order by epoch seconds with a -30d offset (inclusive,
    same bound semantics as the SQL INTERVAL PRECEDING frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT c_custkey,
           FLOOR(percent_rank() OVER w * 1000000) / 1000000 AS pct_rank,
           FLOOR(cume_dist() OVER w * 1000000) / 1000000 AS cum_dist,
           ROUND(first_value(c_acctbal) OVER w, 2) AS lowest_bal,
           ROUND(nth_value(c_acctbal, 10) OVER
                 (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS tenth_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    first_value / nth_value over per-nation balance orderings (unique
    tie-break on custkey keeps both engines' frames identical)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_custkey",
        # floor-truncate instead of round: rank fractions land exactly
        # on .5 ULP-representable boundaries (k / power-of-two-ish n)
        # where Spark's HALF_UP and DuckDB's half-even disagree
        (F.floor(F.percent_rank().over(w) * 1000000) / 1000000).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * 1000000) / 1000000).alias("cum_dist"),
        F.round(F.first("c_acctbal").over(w), 2).alias("lowest_bal"),
        F.round(F.nth_value("c_acctbal", 10).over(w_full), 2).alias("tenth_bal"),
    )
