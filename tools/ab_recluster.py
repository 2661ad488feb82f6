"""Interleaved old-vs-new A/B for the two recluster bench queries
(protocol NEGATIVE.md #19): OLD = the r14 operators/vectors.py loaded
from a checkout of the round-start commit, swapped into sys.modules
between passes (the queries import ivf_* inside their bodies, so the
swap takes effect per invocation); NEW = the current module. The
query functions themselves are unchanged between the two rounds.

Usage: python tools/ab_recluster.py <old_repo_checkout> [sf_dir] [passes]
"""

from __future__ import annotations

import importlib.util
import sys
import time

sys.path.insert(0, ".")

from free_etl_spark.session import get_spark  # noqa: E402
import free_etl_spark.queries as q  # noqa: E402
import free_etl_spark.operators.vectors as new_vectors  # noqa: E402

QUERIES = ["sim_ivf_recluster_apply", "sim_ivf_recluster_incremental"]


def load_old(old_repo: str):
    spec = importlib.util.spec_from_file_location(
        "old_vectors", f"{old_repo}/free_etl_spark/operators/vectors.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run(spark, sf_dir: str, name: str, mod) -> float:
    sys.modules["free_etl_spark.operators.vectors"] = mod
    try:
        t0 = time.time()
        q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0
    finally:
        sys.modules["free_etl_spark.operators.vectors"] = new_vectors


def main() -> None:
    old_repo = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    old_mod = load_old(old_repo)
    spark = get_spark("ab-recluster")
    spark.range(1000).count()
    from free_etl_spark.tables import load_table

    load_table(spark, sf_dir, "embeddings").count()
    for name in QUERIES:  # warm both forms once
        run(spark, sf_dir, name, old_mod)
        run(spark, sf_dir, name, new_vectors)
    for name in QUERIES:
        olds, news = [], []
        for i in range(passes):
            olds.append(run(spark, sf_dir, name, old_mod))
            news.append(run(spark, sf_dir, name, new_vectors))
            print(f"{name} pass {i}: old {olds[-1]:.3f}s  "
                  f"new {news[-1]:.3f}s", flush=True)
        print(f"{name}: old best {min(olds):.3f} med "
              f"{sorted(olds)[len(olds)//2]:.3f} | new best "
              f"{min(news):.3f} med {sorted(news)[len(news)//2]:.3f} | "
              f"new wins {sum(1 for o, n in zip(olds, news) if n < o)}"
              f"/{passes}")
    spark.stop()


if __name__ == "__main__":
    main()
