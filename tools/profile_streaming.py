"""Per-trigger breakdown of the heaviest streaming queries (VERDICT
r15 task 4): monkeypatches run_to_completion to capture each
micro-batch's StreamingQueryProgress durationMs, separating fixture
build / stream planning / per-trigger execution.

Usage: python tools/profile_streaming.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import uuid

sys.path.insert(0, ".")

from free_etl_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "streaming_audio_fingerprint_probe",
    "streaming_ann_probe",
    "streaming_approx_distinct_users",
    "streaming_interval_join",
    "streaming_interval_join_left_outer",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT

    import free_etl_spark.streaming.windows as w

    progress_log: list[dict] = []

    def instrumented(df, output_mode):
        spark = df.sparkSession
        name = f"fes_stream_{uuid.uuid4().hex[:8]}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t0 = time.time()
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            t_started = time.time()
            q.awaitTermination()
            t_done = time.time()
            for p in q.recentProgress:
                progress_log.append(
                    {
                        "batchId": p["batchId"],
                        "numInputRows": p["numInputRows"],
                        "durationMs": p["durationMs"],
                    }
                )
            progress_log.append(
                {
                    "start_s": round(t_started - t0, 3),
                    "drain_s": round(t_done - t_started, 3),
                }
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return spark.table(name)

    w.run_to_completion = instrumented
    # the curation/join modules import run_to_completion by name
    import free_etl_spark.streaming.curation as c
    import free_etl_spark.streaming.joins as j
    import free_etl_spark.streaming.stateful as st
    import free_etl_spark.streaming.rollup as r

    for mod in (c, j, st, r, w):
        if hasattr(mod, "run_to_completion"):
            mod.run_to_completion = instrumented

    import free_etl_spark.queries as q

    spark = get_spark("profile-streaming")
    import os as _os

    if _os.environ.get("PROF_MINPART"):
        spark.conf.set(
            "spark.sql.files.minPartitionNum",
            _os.environ["PROF_MINPART"],
        )
    if _os.environ.get("PROF_MAXPART_BYTES"):
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes",
            _os.environ["PROF_MAXPART_BYTES"],
        )
    spark.range(1000).count()
    from free_etl_spark.tables import ALL_TABLES, load_table

    for t in ALL_TABLES:
        load_table(spark, sf_dir, t).count()

    for rep in range(2):
        for name in names:
            progress_log.clear()
            t0 = time.time()
            q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            total = time.time() - t0
            print(f"\n=== rep{rep} {name}: total {total:.3f}s")
            for entry in progress_log:
                print("   ", json.dumps(entry))
    spark.stop()


if __name__ == "__main__":
    main()
