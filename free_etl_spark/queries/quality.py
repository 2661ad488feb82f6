"""Data-quality operators (training-pipeline staple: profile incoming
tables, enforce constraints before data enters the corpus).

Both are single-pass aggregations — a profile over a 100 TB table is
one scan with map-side partial aggregation, never per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table


@query(
    "quality_profile_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_orderkey) AS distinct_keys,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_custkey,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(SUM(o_totalprice), 2) / COUNT(*) AS avg_price,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS min_date,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS max_date
    FROM orders
    """,
)
def quality_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile: row/key cardinalities, null counts,
    numeric ranges, temporal bounds — ONE scan, one aggregate (the
    count-distincts expand via Spark's distinct-aggregate rewrite,
    still a single logical pass)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("distinct_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        # rounded-sum-over-count: see tpch_q1 rounding note
        (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


@query(
    "quality_constraint_violations",
    oracle="""
    SELECT rule, CAST(n AS BIGINT) AS n FROM (
      SELECT 'doc_text_too_short' AS rule,
             SUM(CASE WHEN LENGTH(text) < 50 THEN 1 ELSE 0 END) AS n
      FROM documents
      UNION ALL
      SELECT 'doc_nchars_mismatch',
             SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END)
      FROM documents
      UNION ALL
      SELECT 'doc_unknown_lang',
             SUM(CASE WHEN lang NOT IN ('en','de','es','fr','zh') THEN 1 ELSE 0 END)
      FROM documents
      UNION ALL
      SELECT 'event_value_negative',
             SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END)
      FROM events
    )
    """,
)
def quality_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite check: each rule is a conditional-sum over its
    table; one scan per table regardless of rule count (rules on the
    same table share the aggregate)."""
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    doc_rules = docs.agg(
        F.sum(F.when(F.length("text") < 50, 1).otherwise(0)).alias("doc_text_too_short"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("doc_nchars_mismatch"),
        F.sum(
            F.when(~F.col("lang").isin("en", "de", "es", "fr", "zh"), 1).otherwise(0)
        ).alias("doc_unknown_lang"),
    )
    ev_rules = ev.agg(
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("event_value_negative")
    )
    long_docs = doc_rules.unpivot([], doc_rules.columns, "rule", "n")
    long_ev = ev_rules.unpivot([], ev_rules.columns, "rule", "n")
    return long_docs.union(long_ev)
