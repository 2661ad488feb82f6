"""Query registry: each engine query registers a (spark, sf_dir) ->
DataFrame callable plus (when SQL-expressible) a DuckDB oracle SQL
string. ``__spark_entry__.py`` exposes the merged dicts to the driver.

Determinism rules every registered query follows (so the driver's
row-count + schema + order-insensitive value-hash comparison against
DuckDB passes):

- every computed column is aliased identically on both sides;
- floating aggregates are ROUND()ed (FP sums are order-dependent —
  rounding absorbs the ~1e-12 relative reassociation error);
- integer-typed results are cast so Spark and DuckDB agree (Spark
  ``year()`` is INT, DuckDB's is BIGINT; DuckDB ``ceil()`` is DOUBLE,
  Spark's is BIGINT; …);
- LIMIT/top-k queries order by rounded keys with unique tie-breakers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
