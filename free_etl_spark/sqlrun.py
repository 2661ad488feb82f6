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

# Temp views are GLOBAL to a session, so caching (session, sf_dir) pairs is
# wrong: A→B→A would skip re-registration on the third call and silently run
# against B's tables. Track only the LAST-registered sf_dir per live session
# (weak-keyed so a GC'd session can't alias a new one via id() reuse).
import weakref

_LAST_SF: "weakref.WeakKeyDictionary[SparkSession, str]" = weakref.WeakKeyDictionary()


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    if _LAST_SF.get(spark) != sf_dir:
        register_views(spark, sf_dir)
        _LAST_SF[spark] = sf_dir
    return spark.sql(sql)
