"""Driver-contract guard: bench.py must run end-to-end and its FINAL
stdout line must survive the grading driver's capture: the driver
stores only the last 2000 chars of stdout and regex-matches
'{"metric"...}' inside that tail. Rounds 4 and 5 both recorded
parsed:null because the final line carried the full per-query dict
and outgrew the window — this test simulates the driver's capture
exactly so that defect cannot recur."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_final_line_survives_driver_tail_window():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    # Stdout discipline is suite-size independent; the full 220+-query
    # suite takes ~9 min at this setting (vs 420 s budget), so the
    # guard proves the contract on a 20-query single-rep subset.
    env["SPARK_GRAFT_BENCH_SUBSET"] = "20"
    env["SPARK_GRAFT_BENCH_REPS"] = "1"
    side_path = os.path.join(_REPO, "BENCH_QUERIES.json")
    side_before = open(side_path).read() if os.path.exists(side_path) else None
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    metric_lines = [l for l in lines if l.startswith('{"metric"')]
    chunk_lines = [l for l in metric_lines if '"per_query_chunk"' in l]
    headline_lines = [l for l in metric_lines if l not in chunk_lines]
    assert len(headline_lines) == 1, out.stdout[-2000:]
    # The canonical line must be LAST and compact — small enough that
    # it can never be truncated out of a 2000-char tail even with the
    # per-query chunk lines immediately before it.
    assert lines[-1] == headline_lines[0]
    assert len(headline_lines[0]) < 500, len(headline_lines[0])
    payload = json.loads(headline_lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert payload["n_queries"] >= 20
    assert "queries" not in payload  # the dict lives on its own line

    # Driver simulation: last 2000 chars, driver-style regex. The tail
    # now also contains per_query_chunk records (VERDICT r14 task 2),
    # so the headline must be recoverable from the FULL match set —
    # it is always the last, untruncated match since the final line is
    # compact and last.
    tail = out.stdout[-2000:]
    recs = []
    for m in re.finditer(r'\{"metric".*\}', tail):
        try:
            recs.append(json.loads(m.group(0)))
        except json.JSONDecodeError:
            pass  # a chunk line truncated by the window
    heads = [r for r in recs if r["metric"] == "headline_query_suite_runtime"]
    assert len(heads) == 1, tail
    assert heads[0]["value"] == payload["value"]
    assert json.loads(tail[tail.rindex('{"metric'):]) == heads[0]

    # Per-query timings: own stdout line, NOT the side file — subset
    # runs probe the stdout contract and must leave the last full-suite
    # BENCH_QUERIES.json measurement untouched.
    qlines = [l for l in lines if l.startswith('{"queries"')]
    assert len(qlines) == 1
    qpayload = json.loads(qlines[0])
    assert len(qpayload["queries"]) >= 20
    assert all(v >= 0 for v in qpayload["queries"].values())

    # Driver-parseable per-query stamps (VERDICT r14 task 2): the same
    # map re-emitted as '{"metric": "per_query_chunk"}' one-line JSON
    # records, each under the driver's 2000-char tail window, printed
    # before (never after) the final headline line. Their union must
    # reconstruct the full per-query map exactly.
    assert chunk_lines, "no per_query_chunk lines emitted"
    merged: dict = {}
    for want_i, line in enumerate(chunk_lines):
        assert len(line) <= 2000, len(line)
        rec = json.loads(line)
        assert rec["metric"] == "per_query_chunk"
        assert rec["i"] == want_i
        merged.update(rec["value"])
    assert merged == qpayload["queries"]
    # chunks come after the queries line and before the headline line
    assert lines.index(chunk_lines[0]) > lines.index(qlines[0])
    assert lines.index(chunk_lines[-1]) < len(lines) - 1
    if side_before is not None:
        assert open(side_path).read() == side_before, (
            "subset run overwrote BENCH_QUERIES.json"
        )


def test_bench_delta_provenance_recomputable():
    """BENCH_DELTA.json must be an honest diff: its prev_round names a
    stamped per-round snapshot, and each recorded delta equals
    cur[k] - prev[k] where cur is the snapshot the same run stamped
    (the highest-numbered BENCH_QUERIES_r{N}.json). r6 shipped a delta
    computed against a mid-round overwrite; this keeps the fix honest."""
    delta_path = os.path.join(_REPO, "BENCH_DELTA.json")
    if not os.path.exists(delta_path):
        return  # no full-SF run recorded yet
    delta = json.load(open(delta_path))
    prev_name = delta["prev_round"]
    prev_path = os.path.join(_REPO, prev_name)
    assert re.match(r"BENCH_(QUERIES_)?r\d+\.json$", prev_name), prev_name
    import glob

    stamped = sorted(glob.glob(os.path.join(_REPO, "BENCH_QUERIES_r*.json")))
    assert stamped, "delta exists but no stamped snapshot does"
    cur = json.load(open(stamped[-1]))["queries"]
    prev_raw = json.load(open(prev_path))
    prev = prev_raw.get("queries") or (prev_raw.get("parsed") or {}).get(
        "queries", {}
    )
    common = [k for k in delta["delta_vs_prev"] if k in cur and k in prev]
    assert len(common) >= 3, common
    for k in common[:50]:
        assert abs(delta["delta_vs_prev"][k] - (cur[k] - prev[k])) < 1e-6, (
            k,
            delta["delta_vs_prev"][k],
            cur[k],
            prev[k],
        )


def test_bench_suite_covers_full_registry():
    """Every registered query must be in the bench suite (HEADLINE +
    registry remainder) so each round's BENCH_QUERIES_r{N}.json stamps
    it and bench_tripwire can guard it. An unknown name in HEADLINE
    (typo / renamed query) must also fail here, not at bench time."""
    import bench
    import free_etl_spark.queries as q

    assert set(bench.HEADLINE) <= set(q.QUERIES), (
        sorted(set(bench.HEADLINE) - set(q.QUERIES))
    )
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    suite = bench.HEADLINE + sorted(set(q.QUERIES) - set(bench.HEADLINE))
    assert set(suite) == set(q.QUERIES)
