"""Scale-path partitioning operators: bucketed joins must plan without
a runtime Exchange; salted joins/aggs must equal their unsalted
equivalents."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from free_etl_spark.operators.partitioning import (
    read_bucketed_join,
    salted_count_by_key,
    salted_join,
    write_bucketed,
)
from free_etl_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # managed-table warehouse for bucketed writes
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_test")
    yield "buckets_test"
    spark.sql("DROP DATABASE IF EXISTS buckets_test CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, f"{warehouse}.orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(li, f"{warehouse}.lineitem_b", ["o_orderkey"], 8, ["o_orderkey"])

    # the tiny test tables would broadcast-join (also shuffle-free, but
    # not what bucketing proves) — force the sort-merge path the 100 TB
    # fact⋈fact case would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed_join(
            spark, f"{warehouse}.orders_b", f"{warehouse}.lineitem_b", ["o_orderkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        assert joined.count() == orders.join(li, "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_equals_plain_join(spark):
    # heavily skewed left side: 90% of rows share one key
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    plain = left.join(right, "k").select("k", "payload", "rv")
    salted = salted_join(left, right, "k", n_salts=4).select("k", "payload", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.range(0, 100).select((F.col("id") % 3).alias("k"), F.col("id").alias("p"))
    right = spark.range(0, 2).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plain = left.join(right, "k", "left").select("k", "p", "v")
    salted = salted_join(left, right, "k", n_salts=3, how="left").select("k", "p", "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_by_key(spark):
    ev = load_table(spark, SF_DIR, "events")
    direct = dict(
        ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    salted = dict(salted_count_by_key(ev, "event_type", n_salts=4).collect())
    assert direct == salted


def test_salted_join_rejects_right_and_full_outer(spark):
    """Replicating the non-skewed side n_salts× would emit unmatched
    right rows once per salt — those join types are rejected."""
    import pytest as _pytest

    from free_etl_spark.operators.partitioning import salted_join

    df = spark.range(4).withColumnRenamed("id", "k")
    other = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(df, other, "k", n_salts=4, how=how)
