"""Quiet-host mover isolation with climate controls (NEGATIVE.md #19).

This host swings ±15-40 % across sessions on identical computations
(the same kcore peel measured 0.8 s and 4.4 s minutes apart; full-suite
medians of 0.93-1.33× have been measured hours apart on unchanged
code). A bare "isolate the mover best-of-4" therefore cannot
distinguish a code regression from a degraded window — r14's close-out
found an isolation session whose UNTOUCHED controls read 1.77× their
seven-round band. This tool bakes the protocol the round ledgers
converged on:

  * targets and a fixed CONTROL set (untouched, pure-compute,
    historically band-stable queries spanning cost shapes) run
    INTERLEAVED in one warm session, best-of-N (default 4), so every
    target rep and control rep samples the same climate;
  * each result is reported against the newest stamped
    BENCH_QUERIES_r{N}.json, and the controls' median ratio-to-stamp
    is reported as ``climate`` — a target is only suspicious when its
    ratio clearly exceeds the climate, not a fixed threshold;
  * ``--intake`` adds the §2A intake 8-file batch (the bench's
    throughput surface, rebuilt exactly as bench.py builds it) as a
    target, giving intake_csv_mb_per_s the same defensible protocol
    (OPTIMIZATION_r14.md "Not yet optimized" #4).

The tool prints numbers and climate; adjudication (ambient vs real)
stays with the reader — per the ledger discipline, a REAL regression
claim additionally needs an interleaved old-vs-new A/B of the exact
code delta in one session.

Usage:
    python tools/isolate_queries.py NAME [NAME ...]
    python tools/isolate_queries.py --movers BASELINE.json [--ratio 1.3]
    python tools/isolate_queries.py --intake
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ISO_REPS=6 python tools/isolate_queries.py ...

``--movers`` derives the target list from the newest stamp vs the
given baseline stamp file: every query at >= ratio (default 1.3) with
baseline >= 0.3 s — the tripwire-mover definition the verdicts use.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# Untouched-by-convention, pure-compute, band-stable across r7-r14;
# one scan-agg, one join, one window, one interval-overlap, one
# array-HOF — so a degraded window shows up whichever cost shape it
# hits hardest. If a round ever edits one of these, swap it out here.
CONTROLS = [
    "tpch_q1_pricing_summary",
    "tpch_q4_order_priority",
    "window_running_total",
    "events_max_concurrency",
    "scalar_array_hof",
]


def newest_stamp() -> tuple[dict, str]:
    best_n, path = -1, None
    for p in _glob.glob(os.path.join(HERE, "BENCH_QUERIES_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best_n, path = int(m.group(1)), p
    if path is None:
        return {}, "none"
    return json.load(open(path)).get("queries", {}), os.path.basename(path)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_ISO_REPS", "4"))
    stamp, stamp_src = newest_stamp()

    with_intake = "--intake" in args
    args = [a for a in args if a != "--intake"]
    ratio_floor = 1.3
    movers_mode = bool(args) and args[0] == "--movers"
    if "--ratio" in args:
        i = args.index("--ratio")
        if i + 1 >= len(args):  # ADVICE r14: trailing --ratio crashed
            print("--ratio requires a value", file=sys.stderr)
            return 2
        if not movers_mode:  # ADVICE r14: silently ignored before
            print("--ratio is only meaningful with --movers",
                  file=sys.stderr)
            return 2
        ratio_floor = float(args[i + 1])
        del args[i : i + 2]
    if movers_mode:
        if len(args) < 2:
            print("--movers requires a baseline stamp file",
                  file=sys.stderr)
            return 2
        base = json.load(open(args[1])).get("queries", {})
        targets = sorted(
            k
            for k, v in stamp.items()
            if not k.endswith("_mb_per_s")
            and base.get(k, 0) >= 0.3
            and v / base[k] >= ratio_floor
        )
    else:
        targets = args

    import free_etl_spark.queries as q
    from free_etl_spark.session import get_spark
    from free_etl_spark.tables import ALL_TABLES, load_table

    unknown = [t for t in targets if t not in q.QUERIES]
    if unknown:
        if movers_mode:
            # ADVICE r14: stamps carry non-query keys (intake_8file_
            # batch) whose documented ~1.4x swing can pass the mover
            # filter — drop them with a note instead of exiting
            print(f"skipping non-registry mover keys: {unknown}",
                  file=sys.stderr)
            targets = [t for t in targets if t in q.QUERIES]
        else:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
    ctrl_in_targets = sorted(set(CONTROLS) & set(targets))
    if ctrl_in_targets:
        # ADVICE r14: a flagged control would bias the climate median
        # upward; report it as a target and keep it out of climate
        print(f"WARNING: CONTROLs are themselves movers/targets "
              f"(excluded from climate): {ctrl_in_targets}",
              file=sys.stderr)
    if not targets and not with_intake:
        print("nothing to isolate", file=sys.stderr)
        return 2

    suite = targets + [c for c in CONTROLS if c not in targets]
    spark = get_spark("isolate-queries")
    spark.range(1000).count()
    for t in ALL_TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # intake fixture, built exactly as bench.py builds it (8-way
    # lineitem CSV split); setup is untimed, the timed unit is one
    # ingest_directory pass over the landing dir
    intake_ctx = None
    if with_intake:
        import shutil
        import tempfile

        from free_etl_spark.intake.config import load_cfg

        work = tempfile.mkdtemp(prefix="iso_intake_")
        landing = os.path.join(work, "landing")
        os.makedirs(landing)
        load_table(spark, sf_dir, "lineitem").repartition(8).write.option(
            "header", True
        ).csv(os.path.join(work, "csv"))
        csv_mb = 0.0
        for i, src in enumerate(
            _glob.glob(os.path.join(work, "csv", "part-*.csv"))
        ):
            csv_mb += os.path.getsize(src) / 1e6
            shutil.move(src, os.path.join(landing, f"upload_{i}.csv"))
        intake_ctx = (work, landing, csv_mb, load_cfg({"app": {"max_file_mb": 4096}}))

    best: dict[str, float] = {}
    try:
        for p in range(reps):
            for name in suite:
                spark.sparkContext.setJobDescription(f"iso:{name}:pass{p}")
                t0 = time.time()
                q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best[name] = min(
                    best.get(name, float("inf")), round(time.time() - t0, 3)
                )
            if intake_ctx is not None:
                from free_etl_spark.intake.spark_intake import ingest_directory

                work, landing, csv_mb, cfg = intake_ctx
                out = os.path.join(work, f"out_{p}")
                t0 = time.time()
                audits, _ = ingest_directory(spark, landing, out, cfg)
                dt = time.time() - t0
                assert audits and all(a.acceptable for a in audits)
                best["intake_8file_batch"] = min(
                    best.get("intake_8file_batch", float("inf")), round(dt, 3)
                )
                best["intake_csv_mb_per_s"] = round(
                    csv_mb / best["intake_8file_batch"], 1
                )
    finally:
        if intake_ctx is not None:
            import shutil

            shutil.rmtree(intake_ctx[0], ignore_errors=True)
        spark.stop()

    # climate comes ONLY from controls that are not also targets
    # (ADVICE r14: a flagged control's inflated ratio would mask real
    # regressions by pulling the climate median up)
    ctrl_ratios = [
        best[c] / stamp[c]
        for c in CONTROLS
        if c in best and stamp.get(c) and c not in targets
    ]
    climate = round(statistics.median(ctrl_ratios), 3) if ctrl_ratios else None
    report = {
        name: {
            "isolated_best": best[name],
            "stamp": stamp.get(name),
            # *_mb_per_s is a throughput (higher is better): a
            # ratio-to-stamp reads inverted against the climate rule,
            # so no ratio is reported for it (ADVICE r14); the timed
            # intake_8file_batch carries the comparable ratio
            "ratio": (
                round(best[name] / stamp[name], 3)
                if stamp.get(name) and not name.endswith("_mb_per_s")
                else None
            ),
            "role": "control" if name in CONTROLS and name not in targets else "target",
        }
        for name in best
    }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "stamp_source": stamp_src,
                "climate_median_control_ratio": climate,
                "queries": report,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
