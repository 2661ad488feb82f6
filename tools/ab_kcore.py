"""Interleaved old-vs-new A/B for graph_kcore's peel materialization
cadence (VERDICT r15 task 7, protocol NEGATIVE.md #19): the shipped
form localCheckpoints every peel round (3 toRdd plannings, ~1 s fixed
cost each); the candidate batches TWO rounds per checkpoint (2
plannings, bigger per-plan subtrees). 5 interleaved passes in ONE
session; decisive only if one form wins every pass.

Usage: python tools/ab_kcore.py [sf_dir] [passes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from free_etl_spark.session import get_spark  # noqa: E402
from free_etl_spark.queries.graph import (  # noqa: E402
    _induced_degrees,
    user_copresence_edges,
)


def peel(edges: DataFrame, k: int, rounds: int, ckpt_every: int) -> DataFrame:
    surv = edges
    for i in range(rounds):
        keep = _induced_degrees(surv).filter(F.col("d") >= k)
        surv = surv.join(
            keep.select(F.col("node").alias("ua")), "ua", "semi"
        ).join(keep.select(F.col("node").alias("ub")), "ub", "semi")
        if (i + 1) % ckpt_every == 0 or i == rounds - 1:
            surv = surv.localCheckpoint(eager=False)
    return _induced_degrees(surv).filter(F.col("d") >= k).select("node")


def run(spark, sf_dir: str, ckpt_every: int) -> float:
    t0 = time.time()
    edges = user_copresence_edges(spark, sf_dir)
    deg0 = _induced_degrees(edges)
    core = peel(edges, k=3, rounds=3, ckpt_every=ckpt_every).withColumn(
        "in_3core", F.lit(True)
    )
    out = deg0.join(core, "node", "left").select(
        F.col("node").alias("user_id"),
        F.col("d").alias("degree"),
        F.coalesce("in_3core", F.lit(False)).alias("in_3core"),
    )
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-kcore")
    spark.range(1000).count()
    run(spark, sf_dir, 1)  # warm both shapes' inputs
    run(spark, sf_dir, 2)
    olds, news = [], []
    for i in range(passes):
        olds.append(run(spark, sf_dir, 1))
        news.append(run(spark, sf_dir, 2))
        print(f"pass {i}: old(ckpt/round) {olds[-1]:.3f}s  "
              f"new(ckpt/2rounds) {news[-1]:.3f}s", flush=True)
    print(f"\nold best {min(olds):.3f} med {sorted(olds)[len(olds)//2]:.3f}")
    print(f"new best {min(news):.3f} med {sorted(news)[len(news)//2]:.3f}")
    wins = sum(1 for o, n in zip(olds, news) if n < o)
    print(f"new wins {wins}/{passes} passes")
    spark.stop()


if __name__ == "__main__":
    main()
