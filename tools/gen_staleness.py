"""Generate tools/query_staleness.json — the driver-row freshness map
(VERDICT r9 task #1).

For each registered query: the round of its LATEST driver CORRECTNESS
row, and whether its source (function body + decorators, which carry
the oracle SQL) has changed since the tree that round's artifact was
recorded against. __spark_entry__._query_order() fronts the stalest
rows (oldest round first, source-changed first within a round) so the
driver's 50/round budget re-verifies the rows most likely to have
silently drifted.

The per-round reference tree is the commit that ADDED
CORRECTNESS_r{N}.json (the round-close snapshot the driver graded).
Function extraction from old trees is by name via ast — a renamed or
moved function can't be matched and is conservatively marked changed.

Run at round end (after the final query wave) and commit the output.
"""

from __future__ import annotations

import ast
import glob
import hashlib
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _last_green_round() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if isinstance(row, dict):
                last[name] = rnd
    return last


def _round_commit(rnd: int) -> str | None:
    """The commit that first added CORRECTNESS_r{rnd}.json."""
    r = subprocess.run(
        [
            "git", "log", "--diff-filter=A", "--format=%H", "--",
            f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json",
        ],
        cwd=HERE, capture_output=True, text=True,
    )
    lines = r.stdout.split()
    return lines[-1] if lines else None


def _func_hash(src: str, funcname: str) -> str | None:
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        if (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            and node.name == funcname
        ):
            decs = "\n".join(
                ast.get_source_segment(src, d) or ""
                for d in node.decorator_list
            )
            seg = decs + "\n" + (ast.get_source_segment(src, node) or "")
            return hashlib.md5(seg.encode()).hexdigest()
    return None


def main() -> None:
    import inspect

    import free_etl_spark.queries as q

    last = _last_green_round()
    commits = {rnd: _round_commit(rnd) for rnd in set(last.values())}
    show_cache: dict[tuple[str, str], str | None] = {}

    out: dict[str, dict] = {}
    for name, fn in q.QUERIES.items():
        rnd = last.get(name)
        if rnd is None:
            continue  # no driver row yet — _query_order fronts it anyway
        src_fn = inspect.unwrap(fn)
        rel = os.path.relpath(inspect.getsourcefile(src_fn), HERE)
        now_hash = _func_hash(open(os.path.join(HERE, rel)).read(), src_fn.__name__)
        commit = commits.get(rnd)
        changed = True  # conservative: unknown == changed
        if commit and now_hash:
            key = (commit, rel)
            if key not in show_cache:
                r = subprocess.run(
                    ["git", "show", f"{commit}:{rel}"],
                    cwd=HERE, capture_output=True, text=True,
                )
                show_cache[key] = r.stdout if r.returncode == 0 else None
            old_src = show_cache[key]
            if old_src is not None:
                changed = _func_hash(old_src, src_fn.__name__) != now_hash
        out[name] = {"round": rnd, "changed": changed}

    path = os.path.join(HERE, "tools", "query_staleness.json")
    json.dump(out, open(path, "w"), indent=0, sort_keys=True)
    n_changed = sum(1 for v in out.values() if v["changed"])
    print(f"{len(out)} queries mapped; {n_changed} changed since their row")


if __name__ == "__main__":
    main()
