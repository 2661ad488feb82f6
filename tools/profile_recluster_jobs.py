"""Job-level breakdown of the recluster bench entries via the Spark UI
REST API: runs one apply-shape and one incremental-shape pass with
per-phase job descriptions, then dumps every job's duration so the
fixed per-action overhead is visible (guide §1/§7.1).

Usage: python tools/profile_recluster_jobs.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from free_etl_spark.session import get_spark  # noqa: E402
from free_etl_spark.tables import load_table  # noqa: E402
from free_etl_spark.operators.vectors import (  # noqa: E402
    ivf_append,
    ivf_list_drift,
    ivf_recluster,
    ivf_recluster_incremental,
    ivf_write,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from pyspark import SparkConf  # noqa: F401

    # the engine session disables the UI; the profiler needs the REST
    # API, so build its session with the UI forced back on
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("profile-recluster-jobs")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled",
                os.environ.get("PROF_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled",
                os.environ.get("PROF_COALESCE", "true"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.minPartitionNum",
                os.environ.get("PROF_MINPART", "1"))
        .getOrCreate()
    )
    spark.range(1000).count()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    emb.count()
    base = emb.filter(F.col("vec_id") % 10 != 0)
    newb = emb.filter(F.col("vec_id") % 10 == 0)
    sc = spark.sparkContext

    def phase(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        print(f"PHASE {name:28s} {time.time() - t0:7.3f}s", flush=True)
        sc.setJobDescription(None)
        return out

    # warm one throwaway build so JIT/codegen costs don't pollute
    wpath = f"/tmp/profj_warm_{os.getpid()}"
    ivf_write(base, wpath, codebook="first_k")
    ivf_append(newb, wpath)
    ivf_recluster(spark, wpath, iters=1)

    path = f"/tmp/profj_apply_{os.getpid()}"
    phase("A:ivf_write", lambda: ivf_write(base, path, codebook="first_k"))
    phase("A:ivf_append", lambda: ivf_append(newb, path))
    phase("A:recluster", lambda: ivf_recluster(spark, path, iters=1))
    phase("A:readback", lambda: spark.read.parquet(path)
          .groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("vec_id").alias("s"))
          .write.format("noop").mode("overwrite").save())

    path2 = f"/tmp/profj_inc_{os.getpid()}"
    phase("I:ivf_write", lambda: ivf_write(base, path2, codebook="first_k"))
    phase("I:ivf_append", lambda: ivf_append(newb, path2))
    hot = phase("I:drift_pick", lambda: int(
        ivf_list_drift(spark, path2)
        .orderBy(F.desc("drift_d2"), "cent_id")
        .select("cent_id").first().cent_id))
    phase("I:recluster_inc", lambda: ivf_recluster_incremental(
        spark, path2, drifted=[hot]))
    phase("I:readback", lambda: spark.read.parquet(path2)
          .groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("vec_id").alias("s"))
          .write.format("noop").mode("overwrite").save())

    app_id = sc.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app_id}/jobs?status=succeeded"
    jobs = json.loads(urllib.request.urlopen(url).read())
    print("\n#job  dur_ms  stages tasks  description")
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        t0 = j.get("submissionTime", "")
        t1 = j.get("completionTime", "")
        from datetime import datetime

        def p(ts):
            return datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f")

        dur = (p(t1) - p(t0)).total_seconds() * 1000 if t0 and t1 else -1
        desc = (j.get("description") or j.get("name", ""))[:90]
        print(f"{j['jobId']:4d} {dur:8.0f} {len(j['stageIds']):5d} "
              f"{j['numTasks']:5d}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
