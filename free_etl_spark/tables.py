"""Test-table loading (TESTDATA.md) with schema normalization.

``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS, tz-naive),
which Spark 4 cannot read natively — we read it as raw nanos
(``spark.sql.legacy.parquet.nanosAsLong``) and derive:

- ``ts_us``  BIGINT      — microseconds since epoch (nanos DIV 1000,
  matching DuckDB's ns→us truncation, so oracle comparisons are exact)
- ``ts``     TIMESTAMP_NTZ — wall-clock timestamp for window functions

All other tables load as-is (ms timestamps arrive as TIMESTAMP_NTZ).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]
AUX_TABLES = ["events", "documents", "embeddings"]
ALL_TABLES = TPCH_TABLES + AUX_TABLES


def _normalize_events(df: DataFrame) -> DataFrame:
    dtypes = dict(df.dtypes)
    if dtypes.get("ts") == "bigint":  # nanosAsLong path
        df = df.withColumn("ts_us", F.expr("ts DIV 1000"))
    else:  # future-proof: reader produced a real timestamp
        df = df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    return df.withColumn(
        "ts", F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; callers must not assume the session was built
    by :func:`free_etl_spark.session.get_spark` (the verify driver brings
    its own), so runtime-settable confs are (re)applied here."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register temp views (used by SQL-expressed queries)."""
    for t in ALL_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{prefix}{t}")
