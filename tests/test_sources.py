"""Source-format coverage (SURVEY.md §2B "scan parquet/csv/json"):
write each format from the canonical parquet tables, read it back,
and require value-level equality — exercising schema round-trips
(CSV needs an explicit schema; JSON preserves types self-describing).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from free_etl_spark.tables import load_table
from tests.conftest import SF_DIR


def _canon(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


def test_csv_round_trip(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    nation.write.csv(out, header=True, mode="overwrite")
    back = spark.read.csv(out, header=True, schema=nation.schema)
    assert _canon(back) == _canon(nation)


def test_csv_failfast_rejects_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n3\n")
    import pytest

    df = spark.read.csv(str(p), header=True, schema="a int, b int", mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()


def test_json_round_trip(spark, tmp_path):
    cust = load_table(spark, SF_DIR, "customer")
    out = str(tmp_path / "customer_json")
    cust.write.json(out, mode="overwrite")
    back = spark.read.json(out, schema=cust.schema)
    assert _canon(back) == _canon(cust)


def test_json_lines_with_nested(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", F.from_json("props", "map<string,bigint>").alias("props_map")
    )
    out = str(tmp_path / "events_json")
    ev.write.json(out, mode="overwrite")
    back = spark.read.json(out, schema="event_id bigint, props_map map<string,bigint>")
    assert back.count() == ev.count()
    joined = back.alias("b").join(ev.alias("e"), "event_id")
    mismatch = joined.filter(
        F.element_at("b.props_map", "k") != F.element_at("e.props_map", "k")
    )
    assert mismatch.count() == 0


def test_partitioned_parquet_prunes(spark, tmp_path):
    """Hive-partitioned write + partition pruning: the pruned read's
    plan must show a PartitionFilters entry and scan fewer files."""
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(out, mode="overwrite")
    back = spark.read.parquet(out)
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan
    expect = docs.filter(F.col("lang") == "en").count()
    assert pruned.count() == expect


def test_orc_round_trip(spark, tmp_path):
    supplier = load_table(spark, SF_DIR, "supplier")
    out = str(tmp_path / "supplier_orc")
    supplier.write.orc(out, mode="overwrite")
    back = spark.read.orc(out)
    assert _canon(back) == _canon(supplier)
    # predicate pushdown reaches the ORC scan too
    plan = (
        back.filter(F.col("s_suppkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(s_suppkey), EqualTo(s_suppkey,1)]" in plan, plan


def test_schema_evolution_merge(spark, tmp_path):
    """Schema drift across landing batches: later files add a column;
    mergeSchema reads the union with nulls backfilled."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        out + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(out + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_zstd_compression_round_trip(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem")
    out = str(tmp_path / "li_zstd")
    li.write.option("compression", "zstd").parquet(out)
    import glob

    files = glob.glob(out + "/*.zstd.parquet")
    assert files, "expected zstd-suffixed parquet files"
    assert spark.read.parquet(out).count() == li.count()


def test_max_records_per_file_bounds_file_size(spark, tmp_path):
    """The file-sizing knob for writers at scale: maxRecordsPerFile
    splits output so no file exceeds the bound (here 1000 rows from a
    single partition -> >= 6 files)."""
    li = load_table(spark, SF_DIR, "lineitem")  # ~6000 rows at sf0.001
    out = str(tmp_path / "li_sized")
    li.coalesce(1).write.option("maxRecordsPerFile", 1000).parquet(out)
    import glob

    files = glob.glob(out + "/part-*.parquet")
    assert len(files) >= 6
    assert spark.read.parquet(out).count() == li.count()


def test_python_datasource_reads_partition_parallel(spark):
    """The custom Python data source must expose its 8 InputPartitions
    as 8 Spark scan partitions (parallel Python workers), not one."""
    import pyspark.sql.functions as F

    import free_etl_spark.queries as q
    from tests.conftest import SF_DIR

    # build the raw scan the same way the query does
    q.QUERIES["source_python_datasource"](spark, SF_DIR)  # registers source
    raw = spark.read.format("fes_seq").load()
    nparts = raw.select(
        F.spark_partition_id().alias("p")
    ).distinct().count()
    assert nparts == 8
    assert raw.count() == 8000


# ---- distributed XLSX source (intake/xlsx_distributed.py) ----------------


def _mk_xlsx(path, rows, cols):
    import pandas as pd

    from free_etl_spark.intake.xlsx_lite import write_xlsx

    path.write_bytes(write_xlsx(pd.DataFrame(rows, columns=cols)))


def test_xlsx_distributed_aligns_columns_by_name(spark, tmp_path):
    """Two files with different column ORDER and one missing a declared
    column: rows align by header name; the missing column reads ""."""
    from free_etl_spark.intake.xlsx_distributed import read_xlsx_distributed

    _mk_xlsx(tmp_path / "a.xlsx", [["1", "x"], ["2", "y"]], ["id", "val"])
    _mk_xlsx(tmp_path / "b.xlsx", [["z", "3"]], ["val", "id"])  # reordered
    _mk_xlsx(tmp_path / "c.xlsx", [["4"]], ["id"])  # missing "val"
    out = read_xlsx_distributed(
        spark, str(tmp_path / "*.xlsx"), columns=["id", "val"]
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [("1", "x"), ("2", "y"), ("3", "z"), ("4", "")]


def test_xlsx_distributed_include_path_lineage(spark, tmp_path):
    from free_etl_spark.intake.xlsx_distributed import read_xlsx_distributed

    _mk_xlsx(tmp_path / "only.xlsx", [["7", "q"]], ["id", "val"])
    row = (
        read_xlsx_distributed(
            spark, str(tmp_path / "*.xlsx"), columns=["id"], include_path=True
        )
        .collect()[0]
    )
    assert row["id"] == "7" and row["_source_path"].endswith("only.xlsx")


def test_xlsx_distributed_capture_isolates_bad_file(spark, tmp_path):
    """One corrupt file among good ones: 'capture' yields the good rows
    plus ONE error row per bad file (op #9 parity at the source)."""
    from free_etl_spark.intake.xlsx_distributed import read_xlsx_distributed

    _mk_xlsx(tmp_path / "good.xlsx", [["1", "x"]], ["id", "val"])
    (tmp_path / "bad.xlsx").write_bytes(b"not a zip at all")
    out = read_xlsx_distributed(
        spark, str(tmp_path / "*.xlsx"), columns=["id", "val"], on_error="capture"
    ).collect()
    ok = [r for r in out if r["_error"] is None]
    bad = [r for r in out if r["_error"] is not None]
    assert len(ok) == 1 and ok[0]["id"] == "1"
    assert len(bad) == 1 and bad[0]["_source_path"].endswith("bad.xlsx")
    assert "Could not parse file" in bad[0]["_error"]


def test_xlsx_distributed_fail_mode_raises(spark, tmp_path):
    import pytest

    from free_etl_spark.intake.xlsx_distributed import read_xlsx_distributed

    (tmp_path / "bad.xlsx").write_bytes(b"junk")
    with pytest.raises(Exception, match="Could not parse file"):
        read_xlsx_distributed(
            spark, str(tmp_path / "*.xlsx"), columns=["id"]
        ).collect()


def test_xlsx_distributed_size_guard(spark, tmp_path):
    """max_bytes is the op #3 size guard applied per file at the
    source: an oversized file becomes an error row, not a parse."""
    from free_etl_spark.intake.xlsx_distributed import read_xlsx_distributed

    _mk_xlsx(tmp_path / "big.xlsx", [["1", "x" * 100]], ["id", "val"])
    out = read_xlsx_distributed(
        spark,
        str(tmp_path / "*.xlsx"),
        columns=["id", "val"],
        max_bytes=10,
        on_error="capture",
    ).collect()
    assert len(out) == 1 and "File too large" in out[0]["_error"]
