"""Phase-level profile of the two recluster bench entries (VERDICT r15
task 1): times each fixture/build/audit step of
sim_ivf_recluster_apply and sim_ivf_recluster_incremental separately,
labelling jobs so the breakdown maps to Spark UI job groups.

Usage: python tools/profile_recluster.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("profile-recluster")
    spark.range(1000).count()
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    emb.count()  # warm footers/page cache
    base = emb.filter(F.col("vec_id") % 10 != 0)
    newb = emb.filter(F.col("vec_id") % 10 == 0)
    sc = spark.sparkContext

    def step(name: str, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        sc.setJobDescription(None)
        print(f"  {name:35s} {dt:7.3f}s")
        return out, dt

    for rep in range(reps):
        print(f"--- rep {rep} : apply-shape (write/append/recluster) ---")
        path = f"/tmp/prof_reclu_{os.getpid()}_{rep}"
        tot = 0.0
        for name, fn in [
            ("ivf_write(first_k)", lambda: ivf_write(base, path, codebook="first_k")),
            ("ivf_append", lambda: ivf_append(newb, path)),
            ("ivf_recluster(iters=1)", lambda: ivf_recluster(spark, path, iters=1)),
            ("readback_agg", lambda: spark.read.parquet(path)
                .groupBy(F.col("cent_id").cast("long").alias("cent_id"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                     F.sum("vec_id").cast("long").alias("sum_vec_id"))
                .write.format("noop").mode("overwrite").save()),
        ]:
            _, dt = step(name, fn)
            tot += dt
        print(f"  {'TOTAL apply-shape':35s} {tot:7.3f}s")

        print(f"--- rep {rep} : incremental-shape ---")
        path2 = f"/tmp/prof_inc_{os.getpid()}_{rep}"
        tot = 0.0
        hot_holder = {}

        def drift_pick():
            hot_holder["hot"] = int(
                ivf_list_drift(spark, path2)
                .orderBy(F.desc("drift_d2"), "cent_id")
                .select("cent_id")
                .first()
                .cent_id
            )

        for name, fn in [
            ("ivf_write(first_k)", lambda: ivf_write(base, path2, codebook="first_k")),
            ("ivf_append", lambda: ivf_append(newb, path2)),
            ("drift_pick_first()", drift_pick),
            ("recluster_incremental", lambda: ivf_recluster_incremental(
                spark, path2, drifted=[hot_holder["hot"]])),
            ("readback_agg", lambda: spark.read.parquet(path2)
                .groupBy(F.col("cent_id").cast("long").alias("cent_id"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                     F.sum("vec_id").cast("long").alias("sum_vec_id"),
                     F.first(F.col("cent_id") == F.lit(hot_holder["hot"]))
                     .alias("was_drifted"))
                .write.format("noop").mode("overwrite").save()),
        ]:
            _, dt = step(name, fn)
            tot += dt
        print(f"  {'TOTAL incremental-shape':35s} {tot:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
