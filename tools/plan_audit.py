"""Physical-plan audit: for each headline query print the properties
that matter at 100 TB — filter pushdown (PushedFilters on the scan),
column pruning (ReadSchema width vs table width), join strategies,
exchange count, and whether Python UDFs appear in the plan.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from free_etl_spark.session import get_spark
import free_etl_spark.queries as q

_STREAMING = {n for n in q.QUERIES if n.startswith("streaming_")}


def _strip_cached_subtrees(plan: str) -> str:
    """Remove the child plans PRINTED under InMemoryTableScan nodes:
    they are the cached relations' build lineage, not operators this
    query executes (the cache is read, not rebuilt), and r14's audit
    let them inflate scan/exchange counts multiplicatively for
    cache-heavy queries (orders_rfm_segmentation printed 128 scans
    while executing 0 — every one nested under a cache hit)."""
    out: list[str] = []
    skip_depth: int | None = None
    for line in plan.splitlines():
        depth = len(re.match(r"^[\s:+\-*()0-9]*", line).group(0))
        if skip_depth is not None:
            if depth > skip_depth:
                continue
            skip_depth = None
        out.append(line)
        if "InMemoryTableScan" in line:
            skip_depth = depth
    return "\n".join(out)


def audit(spark, name: str, sf_dir: str) -> dict:
    df = q.QUERIES[name](spark, sf_dir)
    full = df._jdf.queryExecution().executedPlan().toString()
    # an InMemoryTableScan prints its cached child plan (including the
    # original FileScan) inside the tree — count cache hits separately
    # and don't let their embedded scans inflate the scan count
    plan = _strip_cached_subtrees(full)
    cache_scans = plan.count("InMemoryTableScan")
    scans = re.findall(r"FileScan parquet \S*?\[([^\]]*)\]", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "scans": len(scans),
        "cache_scans": cache_scans,
        "scan_cols": [len([c for c in s.split(",") if c.strip()]) for s in scans],
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_joins": plan.count("CartesianProduct"),
        "exchanges": plan.count("Exchange hashpartitioning"),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas")
        + plan.count("AggregateInPandas"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or [n for n in q.QUERIES if n not in _STREAMING]
    spark = get_spark("plan-audit")
    hdr = (
        f"{'query':34s} scans cache cols/scan pushed bhj smj bnl exch py wsc"
    )
    print(hdr)
    for name in names:
        try:
            a = audit(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} ERROR {e}")
            continue
        cols = ",".join(str(c) for c in a["scan_cols"])
        print(
            f"{name:34s} {a['scans']:5d} {a['cache_scans']:5d} {cols:9s} {a['pushed_filters']:6d} "
            f"{a['broadcast_joins']:3d} {a['sortmerge_joins']:3d} {a['bnl_joins']:3d} "
            f"{a['exchanges']:4d} {a['python_stages']:2d} {a['codegen_spans']:3d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
