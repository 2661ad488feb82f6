"""Set operations: UNION (distinct), INTERSECT, EXCEPT. (SURVEY.md §2B.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table


def _year_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.year("o_orderdate") == year).select("o_custkey")


_Y1, _Y2 = 1996, 1999


@query(
    "set_union",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y1}
    UNION
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y2}
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of two key sets."""
    return (
        _year_custkeys(spark, sf_dir, _Y1)
        .union(_year_custkeys(spark, sf_dir, _Y2))
        .distinct()
    )


@query(
    "set_intersect",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y1}
    INTERSECT
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y2}
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both years."""
    return _year_custkeys(spark, sf_dir, _Y1).intersect(
        _year_custkeys(spark, sf_dir, _Y2)
    )


@query(
    "set_except",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y1}
    EXCEPT
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y2}
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in year 1 but not year 2 (EXCEPT DISTINCT)."""
    return _year_custkeys(spark, sf_dir, _Y1).subtract(
        _year_custkeys(spark, sf_dir, _Y2)
    )


@query(
    "set_union_all",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y1}
    UNION ALL
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y2}
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) — no dedup shuffle at all: partitions of
    both inputs concatenate."""
    return _year_custkeys(spark, sf_dir, _Y1).union(
        _year_custkeys(spark, sf_dir, _Y2)
    )


@query(
    "set_intersect_all",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y1}
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y2}
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: multiplicity = min of the two)."""
    return _year_custkeys(spark, sf_dir, _Y1).intersectAll(
        _year_custkeys(spark, sf_dir, _Y2)
    )


@query(
    "set_except_all",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y1}
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_Y2}
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference: multiplicity = max(0, l - r))."""
    return _year_custkeys(spark, sf_dir, _Y1).exceptAll(
        _year_custkeys(spark, sf_dir, _Y2)
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT entity_kind, entity_key, name, nationkey, acctbal, mktsegment
    FROM (
      SELECT 'customer' AS entity_kind, c_custkey AS entity_key,
             c_name AS name, c_nationkey AS nationkey,
             ROUND(c_acctbal, 2) AS acctbal, c_mktsegment AS mktsegment
      FROM customer
      UNION ALL
      SELECT 'supplier', s_suppkey, s_name, s_nationkey,
             ROUND(s_acctbal, 2), NULL
      FROM supplier
    )
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-schema union (unionByName with missing columns):
    customers and suppliers stack into one entity table, absent
    columns null-backfilled — the schema-drift-tolerant union."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity_kind"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity_kind"),
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)
