"""Upsert (MERGE emulation) and SCD Type-2 operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from free_etl_spark.operators.merge import scd2_apply, upsert_parquet


def _rows(df, *cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_upsert_creates_then_updates_and_inserts(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    upsert_parquet(spark, tgt, base, ["id"])
    upd = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    upsert_parquet(spark, tgt, upd, ["id"])
    got = _rows(spark.read.parquet(tgt), "id", "name", "v")
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_upsert_partition_scoped_rewrite(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "p1", 1.0), (2, "p1", 2.0), (3, "p2", 3.0), (4, "p3", 4.0)],
        "id long, part string, v double",
    )
    upsert_parquet(spark, tgt, base, ["id"], partition_col="part")
    import os

    # capture p3's file set; an upsert touching only p1 must not rewrite it
    p3_dir = os.path.join(tgt, "part=p3")
    before = set(os.listdir(p3_dir))
    upd = spark.createDataFrame([(2, "p1", 2.5), (5, "p1", 5.0)], "id long, part string, v double")
    upsert_parquet(spark, tgt, upd, ["id"], partition_col="part")
    assert set(os.listdir(p3_dir)) == before  # untouched partition intact
    got = _rows(spark.read.parquet(tgt), "id", "v")
    assert got == [(1, 1.0), (2, 2.5), (3, 3.0), (4, 4.0), (5, 5.0)]


def test_scd2_closes_and_appends_versions(spark):
    cur = spark.createDataFrame(
        [
            (1, "addr-one", "2020-01-01", None, True),
            (2, "addr-two", "2020-01-01", None, True),
            (2, "addr-old", "2019-01-01", "2020-01-01", False),
        ],
        "cust_id long, address string, valid_from string, valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(2, "addr-new", "2021-06-01")], "cust_id long, address string, eff string"
    )
    out = scd2_apply(
        cur, changes, ["cust_id"], ["address"], effective_col="eff"
    ).cache()
    # key 1 untouched
    assert _rows(out.filter("cust_id = 1"), "address", "is_current") == [("addr-one", True)]
    # key 2: old current closed at eff date, new version open
    k2 = _rows(out.filter("cust_id = 2"), "address", "valid_from", "valid_to", "is_current")
    assert ("addr-two", "2020-01-01", "2021-06-01", False) in k2
    assert ("addr-new", "2021-06-01", None, True) in k2
    assert ("addr-old", "2019-01-01", "2020-01-01", False) in k2
    # exactly one current row per key
    cur_counts = dict(
        out.filter("is_current").groupBy("cust_id").count().collect()
    )
    assert cur_counts == {1: 1, 2: 1}


def test_profile_table_single_pass(spark):
    from free_etl_spark.operators.profile import profile_table
    from free_etl_spark.tables import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    prof = {(r["column"], r["metric"]): r["value"] for r in profile_table(orders).collect()}
    n = orders.count()
    assert prof[("*", "n_rows")] == str(n)
    assert prof[("o_orderkey", "null_count")] == "0"
    # exact distinct = n for the key; HLL at 5% rsd stays within 10%
    approx = int(prof[("o_orderkey", "approx_distinct")])
    assert abs(approx - n) / n < 0.10
    assert float(prof[("o_totalprice", "min")]) <= float(prof[("o_totalprice", "mean")])
    assert float(prof[("o_totalprice", "mean")]) <= float(prof[("o_totalprice", "max")])
    # non-numeric columns get no min/max/mean
    assert ("o_orderstatus", "mean") not in prof


def test_apply_deletes_partition_scoped(spark, tmp_path):
    from free_etl_spark.operators.merge import apply_deletes

    target = str(tmp_path / "users")
    spark.createDataFrame(
        [(1, "a", "eu"), (2, "b", "eu"), (3, "c", "us"), (4, "d", "us"), (5, "e", "ap")],
        "user_id long, name string, region string",
    ).write.partitionBy("region").parquet(target)

    dels = spark.createDataFrame([(2,), (3,)], "user_id long")
    removed = apply_deletes(spark, target, dels, ["user_id"], partition_col="region")
    assert removed == 2

    left = {r["user_id"]: r["region"] for r in spark.read.parquet(target).collect()}
    assert left == {1: "eu", 4: "us", 5: "ap"}

    # no-op delete batch touches nothing and reports 0
    assert apply_deletes(
        spark, target, spark.createDataFrame([(99,)], "user_id long"),
        ["user_id"], partition_col="region",
    ) == 0
    assert spark.read.parquet(target).count() == 3


def test_incremental_rollup_refresh_equals_full_rebuild(spark, tmp_path):
    """After refreshing only touched buckets, the materialized rollup
    must equal a full recompute over the whole history; untouched
    bucket partitions must not be rewritten."""
    import pyspark.sql.functions as F

    from free_etl_spark.operators.rollup import build_rollup, refresh_rollup
    from free_etl_spark.tables import load_table
    from tests.conftest import SF_DIR

    target = str(tmp_path / "rollup")
    ev = load_table(spark, SF_DIR, "events").select("ts", "event_type", "value")
    first, batch = ev.randomSplit([0.9, 0.1], seed=7)
    build_rollup(first).write.partitionBy("bucket_start").parquet(target)

    all_events = first.unionByName(batch)
    n = refresh_rollup(spark, target, all_events, batch)
    assert n > 0

    cols = ["bucket_start", "event_type", "event_cnt", "sum_value", "max_value"]
    got = spark.read.parquet(target).select(*cols).orderBy(*cols)
    want = build_rollup(all_events).select(*cols).orderBy(*cols)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # idempotent: re-running the same refresh converges
    assert refresh_rollup(spark, target, all_events, batch) == n
    again = spark.read.parquet(target).select(*cols).orderBy(*cols)
    assert [tuple(r) for r in again.collect()] == [tuple(r) for r in want.collect()]


def test_apply_deletes_empties_whole_partition(spark, tmp_path):
    """A delete batch wiping every row of a partition must remove the
    partition's files — dynamic overwrite alone would leave them."""
    from free_etl_spark.operators.merge import apply_deletes

    target = str(tmp_path / "users2")
    spark.createDataFrame(
        [(1, "a", "eu"), (5, "e", "ap")],
        "user_id long, name string, region string",
    ).write.partitionBy("region").parquet(target)

    removed = apply_deletes(
        spark, target, spark.createDataFrame([(5,)], "user_id long"),
        ["user_id"], partition_col="region",
    )
    assert removed == 1
    rows = {(r["user_id"], r["region"]) for r in spark.read.parquet(target).collect()}
    assert rows == {(1, "eu")}


def test_apply_deletes_empties_partition_with_escaped_value(spark, tmp_path):
    """Hive layouts percent-escape special characters in partition
    directory names (``region=a:b`` → ``region=a%3Ab``), so resolving
    the emptied partition's directory by string-formatting the value
    misses it and the files survive deletion. The directory must come
    from the actual on-disk layout."""
    import os

    from free_etl_spark.operators.merge import apply_deletes

    target = str(tmp_path / "esc")
    spark.createDataFrame(
        [(1, "a", "a:b"), (2, "b", "a:b"), (3, "c", "plain")],
        "user_id long, name string, region string",
    ).write.partitionBy("region").parquet(target)
    assert os.path.isdir(os.path.join(target, "region=a%3Ab"))

    removed = apply_deletes(
        spark, target, spark.createDataFrame([(1,), (2,)], "user_id long"),
        ["user_id"], partition_col="region",
    )
    assert removed == 2
    assert not os.path.isdir(os.path.join(target, "region=a%3Ab"))
    rows = {(r["user_id"], r["region"]) for r in spark.read.parquet(target).collect()}
    assert rows == {(3, "plain")}


def test_apply_deletes_flat_table(spark, tmp_path):
    from free_etl_spark.operators.merge import apply_deletes

    target = str(tmp_path / "flat")
    spark.createDataFrame(
        [(i, f"u{i}") for i in range(10)], "user_id long, name string"
    ).write.parquet(target)
    removed = apply_deletes(
        spark, target, spark.createDataFrame([(3,), (7,), (99,)], "user_id long"),
        ["user_id"],
    )
    assert removed == 2
    assert {r["user_id"] for r in spark.read.parquet(target).collect()} == set(
        range(10)
    ) - {3, 7}


def test_upsert_latest_keeps_newest_regardless_of_apply_order(spark, tmp_path):
    """Conditional merge converges to the per-key (ts, id) max no
    matter which order the CDC batches land in."""
    from free_etl_spark.operators.merge import upsert_latest_parquet

    schema = "id long, ts long, v string"
    newer = spark.createDataFrame([(1, 200, "new"), (2, 50, "two")], schema)
    older = spark.createDataFrame([(1, 100, "old"), (3, 10, "three")], schema)

    for batches in ([newer, older], [older, newer]):
        tgt = str(tmp_path / f"tgt_{id(batches[0])}")
        for b in batches:
            upsert_latest_parquet(spark, tgt, b, ["id"], ["ts"])
        got = _rows(spark.read.parquet(tgt), "id", "ts", "v")
        assert got == [(1, 200, "new"), (2, 50, "two"), (3, 10, "three")]


def test_upsert_latest_reduces_batch_duplicates(spark, tmp_path):
    from free_etl_spark.operators.merge import upsert_latest_parquet

    tgt = str(tmp_path / "tgt")
    batch = spark.createDataFrame(
        [(1, 100, "a"), (1, 300, "c"), (1, 200, "b")], "id long, ts long, v string"
    )
    upsert_latest_parquet(spark, tgt, batch, ["id"], ["ts"])
    assert _rows(spark.read.parquet(tgt), "id", "ts", "v") == [(1, 300, "c")]


def test_upsert_replaces_wholesale_including_nulls(spark, tmp_path):
    """A NULL in an update column must CLEAR the target value, not
    silently resurrect the old one (wholesale-replace contract)."""
    tgt = str(tmp_path / "tgt")
    base = spark.createDataFrame([(1, "keep@x", 1.0)], "id long, email string, v double")
    upsert_parquet(spark, tgt, base, ["id"])
    upd = spark.createDataFrame([(1, None, 2.0)], "id long, email string, v double")
    upsert_parquet(spark, tgt, upd, ["id"])
    row = spark.read.parquet(tgt).first()
    assert row["email"] is None and row["v"] == 2.0


def test_upsert_restores_partition_overwrite_mode(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    base = spark.createDataFrame([(1, "a")], "id long, s string")
    upsert_parquet(spark, str(tmp_path / "t"), base, ["id"])
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None
    ) == prev


def test_scd2_collapses_multi_row_batch_to_final_state(spark):
    cur = spark.createDataFrame(
        [(1, "v0", 0, None, True)],
        "id long, val string, valid_from long, valid_to long, is_current boolean",
    )
    # two changes for the same key in one batch: only the LATEST state
    # survives; exactly one closed row and one current row result
    ch = spark.createDataFrame(
        [(1, "v1", 10), (1, "v2", 20)], "id long, val string, eff long"
    )
    out = scd2_apply(cur, ch, ["id"], ["val"], "eff").collect()
    assert len(out) == 2
    current = [r for r in out if r["is_current"]]
    closed = [r for r in out if not r["is_current"]]
    assert len(current) == 1 and current[0]["val"] == "v2"
    assert len(closed) == 1 and closed[0]["valid_to"] == 20


def test_apply_deletes_no_match_skips_rewrite(spark, tmp_path):
    import os

    from free_etl_spark.operators.merge import apply_deletes

    tgt = str(tmp_path / "tgt")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    base.write.parquet(tgt)
    before = sorted(os.listdir(tgt))
    dk = spark.createDataFrame([(99,)], "id long")
    assert apply_deletes(spark, tgt, dk, ["id"]) == 0
    assert sorted(os.listdir(tgt)) == before  # untouched files
