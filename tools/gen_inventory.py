"""Generate docs/INVENTORY.md: one row per registered query —
source location, oracle status, measured gate time — derived from the
live registry so it can't drift from the code.

Usage: python tools/gen_inventory.py
"""

from __future__ import annotations

import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import free_etl_spark.queries as q  # noqa: E402


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        times = json.load(open(os.path.join(here, "tools", "query_times.json")))
    except Exception:
        times = {}

    rows = []
    for name, fn in sorted(q.QUERIES.items()):
        src = inspect.unwrap(fn)
        path = os.path.relpath(inspect.getsourcefile(src), here)
        line = inspect.getsourcelines(src)[1]
        oracle = "value" if name in q.ORACLES else "rows-only"
        t = times.get(name)
        rows.append(
            (name, f"{path}:{line}", oracle, f"{t:.1f}s" if t is not None else "—")
        )

    n_val = sum(1 for r in rows if r[2] == "value")
    lines = [
        "# Query inventory (generated — `python tools/gen_inventory.py`)",
        "",
        f"{len(rows)} registered queries, {n_val} with value-level DuckDB",
        "oracles (rows-only entries are engine-specific sketches). Gate",
        "time is the measured per-query wall at sf0.01 (Spark + oracle).",
        "",
        "| query | source | oracle | gate time |",
        "|---|---|---|---|",
    ]
    lines += [f"| {n} | {s} | {o} | {t} |" for n, s, o, t in rows]
    out = os.path.join(here, "docs", "INVENTORY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} queries, {n_val} value-oracled")


if __name__ == "__main__":
    main()
