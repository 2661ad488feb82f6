"""Invariant + reimplementation pins for the round-12 wave operators
(bloom-prefilter join, partition-grain backfill, range-partitioned
export, IVF+PQ search, merge-on-read delete vectors)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from free_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from free_etl_spark.session import get_spark

    return get_spark("test-r12-waves")


def _bloom_pos(key: int, seed: int, m: int = 1024) -> int:
    h = hashlib.md5(f"{key}".encode()).hexdigest()
    return int(h[8 * seed : 8 * seed + 8], 16) % m


def test_bloom_prefilter_no_false_negatives_and_exact_construction(spark):
    """The bloom semi-join must (a) never drop a matching row —
    n_matched equals the plain exact semi-join per group — and
    (b) pass exactly the rows a hashlib replication of the k=3
    md5 bloom admits (pins the bit layout, not just the outcome)."""
    got = (
        QUERIES["join_bloom_prefilter"](spark, SF_DIR)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    sup = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    dim = set(sup.loc[sup.s_suppkey % 4 == 1, "s_suppkey"])
    bits = {_bloom_pos(k, s) for k in dim for s in range(3)}
    li = li.assign(
        passed=li.l_suppkey.map(
            lambda k: all(_bloom_pos(k, s) in bits for s in range(3))
        ),
        matched=li.l_suppkey.isin(dim),
    )
    # no false negatives: every matching row passes the bloom
    assert (li.matched <= li.passed).all()
    want = (
        li[li.passed]
        .groupby("l_returnflag")
        .agg(n_bloom_pass=("passed", "size"), n_matched=("matched", "sum"))
        .reset_index()
    )
    assert got[["l_returnflag", "n_bloom_pass", "n_matched"]].values.tolist() == (
        want.values.tolist()
    )


def test_range_export_layout_and_prune_equals_full_scan(spark):
    """Layout invariant: exactly one data file per non-empty range
    bucket, with non-overlapping [min,max] day spans in file order;
    and the manifest-pruned aggregate must equal a full-scan
    recompute (pruning may never change the answer)."""
    import glob

    got = (
        QUERIES["source_range_partitioned_export"](spark, SF_DIR)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    path = glob.glob(f"/tmp/fes_rangexp_sf0.001_{spark.sparkContext.applicationId}")
    assert path, "export dir missing"
    spans = []
    for d in sorted(glob.glob(f"{path[0]}/bkt=*")):
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, f"{d} has {len(files)} files"
        import pyarrow.parquet as pq

        md = pq.ParquetFile(files[0]).metadata
        idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "sd_d"
        )
        st = md.row_group(0).column(idx).statistics
        spans.append((int(d.split("=")[1]), st.min, st.max))
    spans.sort()
    for (_, _, mx_prev), (_, mn_next, _) in zip(spans, spans[1:]):
        assert mx_prev <= mn_next  # ranges ordered, boundary rows may tie
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    sd = (li.l_shipdate.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    mask = (sd >= 9496) & (sd <= 9861)
    want = (
        li[mask]
        .groupby("l_returnflag")
        .size()
        .reset_index(name="n_rows")
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert got[["l_returnflag", "n_rows"]].values.tolist() == want.values.tolist()


def test_mor_position_deletes_distinguish_duplicate_keys(spark, tmp_path):
    """The property key-based deletes cannot have: with fully
    duplicated rows, a position delete removes exactly the targeted
    physical occurrences and leaves the twins."""
    import pyspark.sql.functions as F

    data = str(tmp_path / "data")
    spark.createDataFrame(
        [(1, "a")] * 3 + [(2, "b")] * 2, "k int, v string"
    ).coalesce(1).write.parquet(data)
    scan = spark.read.parquet(data).select(
        "k",
        "v",
        F.col("_metadata.file_path").alias("dv_file"),
        F.col("_metadata.row_index").alias("dv_pos"),
    )
    # delete ONE physical occurrence of each key: lowest position
    dv = scan.groupBy("k").agg(
        F.min("dv_pos").alias("dv_pos"), F.first("dv_file").alias("dv_file")
    ).select("dv_file", "dv_pos")
    live = scan.join(F.broadcast(dv), ["dv_file", "dv_pos"], "left_anti")
    counts = {
        r["k"]: r["n"]
        for r in live.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 2, 2: 1}


def test_range_export_halfwritten_fixture_rebuilds(spark, tmp_path):
    """A crashed export (no _SUCCESS) must be rebuilt on the next
    call, and the rebuilt answer must equal the pre-crash answer —
    the overwrite-mode guard the per-(sf, app) fixture relies on."""
    import glob
    import os
    import shutil

    before = (
        QUERIES["source_range_partitioned_export"](spark, SF_DIR)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    path = glob.glob(
        f"/tmp/fes_rangexp_sf0.001_{spark.sparkContext.applicationId}"
    )[0]
    # simulate the crash window: SOME files written, no _SUCCESS
    os.remove(os.path.join(path, "_SUCCESS"))
    victims = glob.glob(os.path.join(path, "bkt=*"))[:3]
    for v in victims:
        shutil.rmtree(v)
    after = (
        QUERIES["source_range_partitioned_export"](spark, SF_DIR)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert after.values.tolist() == before.values.tolist()
    assert os.path.exists(os.path.join(path, "_SUCCESS"))


def test_mv_refresh_restores_partition_overwrite_mode(spark):
    """The r12 full-suite find: both rollup paths set dynamic
    partition-overwrite for their own write; leaking it session-wide
    suppresses _SUCCESS markers on every later partitionBy overwrite
    (breaking fixture idempotency guards) and silently changes
    overwrite semantics. After either MV query runs, the session conf
    must be back to its prior state, and a subsequent partitioned
    overwrite must stamp _SUCCESS."""
    import glob
    import os

    key = "spark.sql.sources.partitionOverwriteMode"
    assert spark.conf.get(key, None) != "dynamic"
    QUERIES["mv_incremental_refresh"](spark, SF_DIR).collect()
    assert spark.conf.get(key, None) != "dynamic"
    QUERIES["streaming_mv_refresh"](spark, SF_DIR).collect()
    assert spark.conf.get(key, None) != "dynamic"
    # end-to-end: the export fixture rebuilt AFTER the MV queries
    # must still stamp its _SUCCESS idempotency marker
    path = glob.glob(
        f"/tmp/fes_rangexp_sf0.001_{spark.sparkContext.applicationId}"
    )
    if path:
        import shutil

        shutil.rmtree(path[0])
    QUERIES["source_range_partitioned_export"](spark, SF_DIR).collect()
    assert os.path.exists(
        f"/tmp/fes_rangexp_sf0.001_{spark.sparkContext.applicationId}/_SUCCESS"
    )


@pytest.mark.parametrize("hasher", ["md5", "xxhash64"])
def test_bloom_prefilter_both_hashers_no_false_negatives(spark, hasher):
    """bloom_prefilter must never drop a matching fact row under
    EITHER hasher: the md5 oracle mode and the xxhash64 production
    mode (Kirsch–Mitzenmacher double hashing) both admit a superset
    of the plain exact semi-join — position choice affects only the
    false-positive rate, never membership of true keys."""
    import pyspark.sql.functions as F

    from free_etl_spark.queries.relational import bloom_prefilter
    from free_etl_spark.tables import load_table

    dim = (
        load_table(spark, SF_DIR, "supplier")
        .filter(F.col("s_suppkey") % 4 == 1)
        .select(F.col("s_suppkey").alias("k"))
    )
    fact = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    passed = {
        (r.l_orderkey, r.l_linenumber)
        for r in bloom_prefilter(
            fact, dim, "l_suppkey", m=1024, k=3, hasher=hasher
        ).collect()
    }
    exact = {
        (r.l_orderkey, r.l_linenumber)
        for r in fact.join(
            F.broadcast(dim), fact.l_suppkey == F.col("k"), "left_semi"
        ).collect()
    }
    assert exact <= passed  # no false negatives
    # the bloom actually filters (not a pass-everything bitmap)
    assert len(passed) < fact.count()


def test_bloom_prefilter_unknown_hasher_rejected(spark):
    import pyspark.sql.functions as F

    from free_etl_spark.queries.relational import bloom_positions

    with pytest.raises(ValueError):
        bloom_positions(F.lit(1), 3, 1024, hasher="sha1")


def test_time_travel_reads_exact_manifest_files_and_never_rewrites(spark):
    """Snapshot isolation, physically: an AS-OF read must open EXACTLY
    its manifest's files (v1 never sees v2's appends — pinned via
    inputFiles), the append commit must reuse v1's files byte-identical
    (immutability), and the v3 delete must remove exactly the predicate
    victims without touching any data file."""
    import json
    import os

    import pyspark.sql.functions as F

    from free_etl_spark.tables import load_table

    QUERIES["source_time_travel_read"](spark, SF_DIR).collect()  # build
    base = os.path.join(
        "/tmp",
        f"fes_ttl_{os.path.basename(os.path.normpath(SF_DIR))}"
        f"_{spark.sparkContext.applicationId}",
    )
    log_dir = os.path.join(base, "_log")
    mans = {
        v: json.load(open(os.path.join(log_dir, f"v{v}.json")))
        for v in (1, 2, 3)
    }
    # manifests are strictly growing file sets; v1's files are shared
    assert set(mans[1]["files"]) < set(mans[2]["files"])
    assert set(mans[2]["files"]) == set(mans[3]["files"])
    sizes_before = {f: os.path.getsize(f) for f in mans[2]["files"]}

    # an AS-OF v1 scan opens exactly v1's manifest files
    opened = set(spark.read.parquet(*mans[1]["files"]).inputFiles())
    assert {p.replace("file://", "") for p in opened} == set(mans[1]["files"])

    got = {
        r.version: (r.n_rows, r.total_price)
        for r in QUERIES["source_time_travel_read"](spark, SF_DIR).collect()
    }
    orders = load_table(spark, SF_DIR, "orders")
    v2_n = orders.count()
    v1_n = orders.filter(F.col("o_orderkey") % 4 != 3).count()
    v3_n = v2_n - orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 5 == 0)
    ).count()
    assert (got[1][0], got[2][0], got[3][0]) == (v1_n, v2_n, v3_n)
    # no commit rewrote a committed data file
    assert {f: os.path.getsize(f) for f in mans[2]["files"]} == sizes_before


def test_log_vacuum_deletes_only_unreachable_and_is_stable(spark):
    """Vacuum must delete EXACTLY the data files unreachable from the
    retained manifests (log-derived reachability, never mtime), the
    retained version must stay fully readable afterwards, and a second
    invocation in the same session must return the identical row
    (the persisted vacuum report, not a re-vacuum)."""
    import json
    import os

    r1 = QUERIES["source_log_compact_vacuum"](spark, SF_DIR).collect()
    base = os.path.join(
        "/tmp",
        f"fes_ttv_{os.path.basename(os.path.normpath(SF_DIR))}"
        f"_{spark.sparkContext.applicationId}",
    )
    log_dir = os.path.join(base, "_log")
    man4 = json.load(open(os.path.join(log_dir, "v4.json")))
    vac = json.load(open(os.path.join(log_dir, "vacuum.json")))
    # every retained file survives; every vacuumed file is gone
    assert all(os.path.exists(f) for f in man4["files"])
    assert all(not os.path.exists(f) for f in vac["vacuumed"])
    assert set(vac["vacuumed"]).isdisjoint(man4["files"])
    assert vac["n_vacuumed"] == 5 and len(man4["files"]) == 2
    # stability across calls: report is read, not recomputed
    r2 = QUERIES["source_log_compact_vacuum"](spark, SF_DIR).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
