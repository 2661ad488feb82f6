"""Driver-contract guard: bench.py must run end-to-end and print one
valid JSON line with the expected shape (the per-round driver executes
it verbatim)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        l for l in out.stdout.splitlines() if l.startswith('{"metric"')
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    payload = json.loads(json_lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert len(payload["queries"]) >= 25
    assert all(v >= 0 for v in payload["queries"].values())
