"""Versioned parquet table with AS-OF (time-travel) reads — the
lakehouse capability (Delta/Iceberg snapshot reads) rebuilt on plain
parquet plus a JSON commit log.

Layout:

    table_dir/
      _log/00000001.json   {"version": 1, "op": "overwrite",
                            "files": ["v1/part-...parquet", ...]}
      _log/00000002.json   {"version": 2, "op": "append", "files": [...]}
      v1/part-*.parquet    (immutable once committed)
      v2/part-*.parquet

Commits are write-data-then-publish-log: data files land under an
unpublished version directory first, and the zero-padded log entry is
the atomic publish (a single driver-side file create — readers that
don't see the log entry don't see the data). Version N's visible file
set is replayed from the log: walk entries 1..N, `overwrite` resets
the set, `append` extends it. Old data directories are never mutated,
so every historical version stays readable until a retention pass
removes log entries and their unreferenced directories (`vacuum`).

At 100 TB this is exactly the Delta/Iceberg shape: manifests are
driver-side metadata (KB per commit), data moves only through
executor-side writes, and an AS-OF read plans a plain multi-path
parquet scan over the resolved file list — pushdown/pruning work
unchanged. What a real table format adds on top is concurrent-writer
arbitration (optimistic log-entry CAS), which a single-writer
pipeline does not need.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def _entries(table_dir: str) -> list[dict]:
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def latest_version(table_dir: str) -> int:
    es = _entries(table_dir)
    return es[-1]["version"] if es else 0


def commit_version(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    op: str = "append",
) -> int:
    """Commit ``df`` as the next version (op: 'append'|'overwrite').
    Returns the new version number. Data is written BEFORE the log
    entry is published, so a crash mid-commit leaves an invisible
    orphan directory, never a half-visible version. An orphan left by
    a previous crashed commit (data dir present, log entry absent) is
    swept here before writing — by the write-then-publish invariant it
    was never visible to any reader, so removal is safe, and without
    the sweep the errorifexists write would block this and every
    future commit at the same version number."""
    if op not in ("append", "overwrite"):
        raise ValueError(f"unknown op {op!r}")
    v = latest_version(table_dir) + 1
    vdir = f"v{v}"
    target = os.path.join(table_dir, vdir)
    if os.path.isdir(target) and not os.path.exists(
        os.path.join(_log_dir(table_dir), f"{v:08d}.json")
    ):
        import shutil

        shutil.rmtree(target)
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, vdir))
    files = sorted(
        os.path.join(vdir, f)
        for f in os.listdir(os.path.join(table_dir, vdir))
        if f.endswith(".parquet")
    )
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    entry = {"version": v, "op": op, "files": files}
    # single create = the atomic publish point
    with open(os.path.join(_log_dir(table_dir), f"{v:08d}.json"), "x") as f:
        json.dump(entry, f)
    return v


def files_as_of(table_dir: str, version: int | None = None) -> list[str]:
    """Resolve the visible data-file list at ``version`` (default:
    latest) by replaying the commit log."""
    files: list[str] = []
    for e in _entries(table_dir):
        if version is not None and e["version"] > version:
            break
        if e["op"] == "overwrite":
            files = list(e["files"])
        else:
            files.extend(e["files"])
    return [os.path.join(table_dir, f) for f in files]


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """AS-OF read: a plain multi-path parquet scan over the resolved
    file list — pushdown and pruning apply as on any parquet read."""
    files = files_as_of(table_dir, version)
    if not files:
        raise ValueError(
            f"no files visible at version {version} in {table_dir}"
        )
    return spark.read.parquet(*files)


def vacuum(table_dir: str, keep_from_version: int) -> list[str]:
    """Retention: drop log entries BELOW ``keep_from_version`` whose
    files are unreferenced by any surviving version, and delete those
    files. Returns removed paths. The surviving history must start
    with an 'overwrite' (else older appends are still part of the
    visible set and are retained)."""
    import shutil

    es = _entries(table_dir)
    survivors = [e for e in es if e["version"] >= keep_from_version]
    # files still referenced by replaying from the first survivor —
    # if the first survivor is an append, earlier entries still
    # contribute and cannot be vacuumed
    while survivors and survivors[0]["op"] != "overwrite":
        keep_from_version = survivors[0]["version"] - 1
        survivors = [e for e in es if e["version"] >= keep_from_version]
        if keep_from_version <= 1:
            return []
    referenced = {f for e in survivors for f in e["files"]}
    removed: list[str] = []
    for e in es:
        if e["version"] >= keep_from_version:
            continue
        for f in e["files"]:
            if f not in referenced:
                p = os.path.join(table_dir, f)
                if os.path.exists(p):
                    os.remove(p)
                removed.append(p)
        os.remove(os.path.join(_log_dir(table_dir), f"{e['version']:08d}.json"))
    # sweep emptied version dirs
    for name in os.listdir(table_dir):
        p = os.path.join(table_dir, name)
        if name.startswith("v") and os.path.isdir(p) and not os.listdir(p):
            shutil.rmtree(p)
    return removed
