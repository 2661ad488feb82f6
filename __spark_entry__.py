"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
registered operator inventory from free_etl_spark (SURVEY.md §2) —
each query callable takes (spark, sf_dir) and returns a DataFrame;
each oracle is ANSI SQL DuckDB runs on the same parquet tables.
Queries without an oracle entry (approx sketches, engine-specific LSH,
simhash bit hashing) get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import free_etl_spark.queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible
    query (same column aliases as the Spark result)."""
    return dict(_q.ORACLES)
