"""Table maintenance operators: small-file compaction and multi-column
z-order clustering — the two layout jobs a 100 TB parquet lake runs on
a schedule.

**Compaction**: streaming/CDC writers leave many small files; scans
then pay per-file open/footer costs and lose row-group locality.
``compact_parquet`` rewrites a directory (or its partitions) into
size-targeted files. Safety: the rewrite goes to a temp sibling and
swaps in only after success.

**Z-order**: a single-column sort gives perfect skipping on one
predicate column and none on others. Interleaving the bits of several
rank-normalized columns into one z-value and range-partitioning on it
gives every participating column locality, so per-file min/max ranges
are narrow on ALL of them — multi-column data skipping without an
index. The z-value is computed with JVM-side bit arithmetic (no UDF).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


def compact_parquet(
    spark: SparkSession,
    table_dir: str,
    target_file_mb: int = 512,
) -> tuple[int, int]:
    """Rewrite ``table_dir`` into ~``target_file_mb`` files.

    Returns (files_before, files_after). File count is derived from
    actual on-disk bytes / target size (ceil, min 1), so the operator
    adapts to the real data volume rather than a row-count guess.
    The rewrite lands in a temp sibling directory and replaces the
    original only after the write succeeds — a failed compaction
    leaves the table untouched."""
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(table_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total_bytes // (target_file_mb << 20)))

    tmp = table_dir.rstrip("/") + "__compacting"
    df = spark.read.parquet(table_dir)
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    backup = table_dir.rstrip("/") + "__precompact"
    os.rename(table_dir, backup)
    os.rename(tmp, table_dir)
    shutil.rmtree(backup, ignore_errors=True)

    after = [
        f
        for dp, _, fs in os.walk(table_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    return len(files), len(after)


_Z_BITS = 16  # per-column resolution: 2^16 rank buckets


def zorder_values(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add a ``__z`` column interleaving the bits of each column's
    rank (percent_rank quantized to 16 bits). Rank-normalization makes
    the curve robust to skewed/arbitrary-typed columns (anything
    orderable works); the bit interleave is a fixed-depth loop of
    shifts/ors — whole-stage-codegen friendly, no Python.

    The single global-ordering window here is the rank computation —
    at 100 TB swap it for an approx-quantile bucketization (same
    downstream interleave); the operator's contract (z-value column)
    is unchanged."""
    out = df
    for i, c in enumerate(cols):
        w = Window.orderBy(F.col(c))
        out = out.withColumn(
            f"__r{i}",
            F.least(
                F.floor(F.percent_rank().over(w) * (1 << _Z_BITS)),
                F.lit((1 << _Z_BITS) - 1),
            ).cast("long"),
        )
    z = F.lit(0).cast("long")
    n = len(cols)
    for bit in range(_Z_BITS):
        for i in range(n):
            z = z + (
                F.shiftright(F.col(f"__r{i}"), bit).bitwiseAND(1)
                * F.lit(1 << (bit * n + i)).cast("long")
            )
    return out.withColumn("__z", z).drop(*[f"__r{i}" for i in range(n)])


def zorder_write(
    df: DataFrame, out_dir: str, cols: list[str], n_files: int = 8
) -> None:
    """Write ``df`` z-ordered on ``cols``: range-partition on the
    interleaved z-value and sort within partitions, so every output
    file covers a compact hyper-rectangle — per-file min/max stats are
    narrow on EVERY participating column and scans with predicates on
    any of them prune files (verified in tests/test_maintenance.py)."""
    (
        zorder_values(df, cols)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
