"""SQL entry point: run ANSI SQL against the engine's tables.

The DataFrame queries in ``free_etl_spark.queries`` are the primary
surface, but everything is equally reachable as SQL — `spark.sql`
parses/plans through the same Catalyst pipeline, so a user migrating
from a SQL engine can keep their queries verbatim.

``run_sql`` registers the test tables as temp views (once per
session+sf_dir) and executes the statement. Portability note: the
DuckDB oracle strings in this repo are *mostly* ANSI — the ones using
DuckDB list lambdas / generate_series won't parse on Spark, which is
exactly why the oracle layer exists as a separate correctness check
rather than a shared implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from free_etl_spark.tables import register_views

_REGISTERED: set[tuple[int, str]] = set()


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _REGISTERED:
        register_views(spark, sf_dir)
        _REGISTERED.add(key)
    return spark.sql(sql)
