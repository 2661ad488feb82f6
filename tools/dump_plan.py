"""Dump .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/dump_plan.py <tag> <suffix> [sf_dir] <query ...>

Writes plans/<tag>/<query>_<suffix>.txt for each query. Streaming
queries are skipped (no batch plan). Procedural queries (store
builders) dump the plan of the DataFrame they return; the build-side
jobs' shapes are documented separately in OPTIMIZATION notes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from free_etl_spark.session import get_spark  # noqa: E402
import free_etl_spark.queries as q  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    args = sys.argv[3:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    outdir = os.path.join("plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump")
    for name in names:
        try:
            df = q.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR dumping plan: {e!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
