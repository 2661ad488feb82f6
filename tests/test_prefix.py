"""operators/prefix.py: the distributed prefix-sum / NTILE forms must
be value-identical to the single-partition window functions they
replace — including the nondeterminism trap that motivated the
persist (two plan branches sampling different range boundaries)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from free_etl_spark.operators.prefix import global_ntile, ordered_prefix


@pytest.fixture(scope="module")
def scrambled(spark):
    # keys deliberately not aligned with the generation order, plus a
    # payload column so column pruning differs between the window and
    # totals branches (the exact condition that broke exchange reuse)
    return spark.range(0, 2003).select(
        (F.col("id") * 37 % 2003).alias("k"),
        (F.col("id") % 7).alias("v"),
        F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
    )


def test_ordered_prefix_matches_global_window(spark, scrambled):
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = (
        scrambled.select(
            "k",
            F.sum("v").over(w).alias("cs"),
            F.row_number().over(Window.orderBy("k")).cast("long").alias("rn"),
        )
        .orderBy("k")
        .toPandas()
    )
    got = (
        ordered_prefix(
            scrambled,
            [F.col("k")],
            cache_tag="test_prefix",
            sums={"cs": "v"},
            rn="rn",
            grand={"tot": "v"},
        )
        .orderBy("k")
        .toPandas()
    )
    assert (got["cs"].values == ref["cs"].values).all()
    assert (got["rn"].values == ref["rn"].values).all()
    assert (got["tot"] == ref["cs"].iloc[-1]).all()
    # payload survives untouched
    assert got["payload"].str.startswith("payload_").all()


@pytest.mark.parametrize("k", [4, 5, 7])
def test_global_ntile_matches_sql_ntile(spark, scrambled, k):
    order = [F.desc("k")]
    ref = (
        scrambled.select(
            "k", F.ntile(k).over(Window.orderBy(F.desc("k"))).alias("b")
        )
        .orderBy("k")
        .toPandas()
    )
    got = (
        global_ntile(scrambled, order, k, "b", cache_tag=f"test_ntile_{k}")
        .orderBy("k")
        .toPandas()
    )
    assert (got["b"].values == ref["b"].values).all()


def test_global_ntile_small_n(spark):
    # n < k: NTILE gives bucket i to row i
    df = spark.range(0, 3).select(F.col("id").alias("k"))
    got = (
        global_ntile(df, [F.col("k")], 5, "b", cache_tag="test_small")
        .orderBy("k")
        .toPandas()
    )
    assert list(got["b"]) == [1, 2, 3]


def test_repeated_construction_is_stable_and_bounded(spark, scrambled):
    """Re-running the same prefix query must produce identical values
    (regression for the two-branch boundary-sampling bug) and must not
    accumulate cache entries (one live entry per tag)."""
    from free_etl_spark.operators.prefix import _PART_CACHE

    vals = []
    for _ in range(3):
        df = global_ntile(
            scrambled, [F.col("k")], 4, "b", cache_tag="test_stable"
        )
        vals.append(tuple(df.orderBy("k").toPandas()["b"]))
    assert vals[0] == vals[1] == vals[2]
    assert (
        sum(1 for (_, tag) in _PART_CACHE if tag == "test_stable") == 1
    )
