"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
registered operator inventory from free_etl_spark (SURVEY.md §2) —
each query callable takes (spark, sf_dir) and returns a DataFrame;
each oracle is ANSI SQL DuckDB runs on the same parquet tables.
Every registered query carries an oracle: the two engine-specific
approx sketches (HLL count-distinct, approx percentile) expose
within-tolerance booleans vs the exact aggregate computed in the same
query, so the oracle pins them to TRUE; the LSH/simhash/minhash paths
are md5-deterministic and fully value-oracled.
"""

from __future__ import annotations

import glob as _glob
import json as _json
import os as _os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import free_etl_spark.queries as _q

_HERE = _os.path.dirname(_os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _query_order() -> list[str]:
    """Order queries for a possibly time/count-budgeted verifier.

    Front group: queries with no green row in any prior round's
    CORRECTNESS_r*.json (new or known-red) — every round verifies the
    largest possible set of not-yet-proven queries, cheapest first
    (tools/query_times.json snapshot) so a fixed budget covers most.

    Verified group — FRESHNESS ROTATION (VERDICT r9, key flipped in
    r11 per VERDICT r10): with the whole registry green, a 50/round
    budget means rows go stale; order green queries stalest-first so
    no row ages unboundedly. Staleness key: (source-changed-since-
    green FIRST, round of the latest driver row ascending, cheap
    first) — a query whose code changed after its last green stamp
    outranks one that is merely old, because the stamp no longer
    covers the code that ships. The round is computed live
    from the artifacts (a red row in round N re-fronts the query via
    the status pass regardless); the changed flag comes from
    tools/query_staleness.json, regenerated at round end by
    tools/gen_staleness.py via git — missing file degrades to
    round-only rotation, never to an error."""
    # last-write-wins across rounds (files sort by zero-padded round
    # number): a query green in round N-1 but red in round N must be
    # re-fronted — its LATEST row decides. A query green earlier and
    # simply not re-run since keeps its green.
    status: dict[str, bool] = {}
    last_round: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(_os.path.basename(path).split("_r")[1].split(".")[0])
            for name, row in _json.load(open(path)).items():
                # green = ran without error AND no recorded mismatch.
                # err=None with hash_match=False is a VALUE FAILURE —
                # those must sort with the unverified so a budgeted
                # verifier re-checks exactly the known-red queries.
                # (rows-only sketches record err='no_oracle' and all
                # matches None — they also stay in the front group.)
                if isinstance(row, dict):
                    status[name] = not row.get("err") and not any(
                        row.get(k) is False
                        for k in ("rows_match", "schema_match", "hash_match")
                    )
                    last_round[name] = rnd
        except Exception:  # malformed artifact — ignore, keep default order
            pass
    verified = {name for name, green in status.items() if green}
    try:
        times = _json.load(open(_os.path.join(_HERE, "tools", "query_times.json")))
    except Exception:
        times = {}
    try:
        stale = _json.load(
            open(_os.path.join(_HERE, "tools", "query_staleness.json"))
        )
    except Exception:
        stale = {}

    def key(n: str):
        if n not in verified:
            return (0, 0, False, times.get(n, 99.0), n)
        unchanged = not stale.get(n, {}).get("changed", False)
        return (1, unchanged, last_round.get(n, 0), times.get(n, 99.0), n)

    return sorted(_q.QUERIES, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: _q.QUERIES[n] for n in _query_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible
    query (same column aliases as the Spark result)."""
    return dict(_q.ORACLES)
