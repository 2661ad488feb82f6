"""Interleaved old-vs-new A/B for orders_rfm_segmentation (protocol
NEGATIVE.md #19): OLD = three chained global_ntile passes on one
lineage (the r14 form); NEW = the lazy boundary-scored form the query
now ships. 5 interleaved passes, one session, timing construction +
noop write exactly as bench.py does.

Usage: python tools/ab_rfm.py [sf_dir] [passes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from free_etl_spark.session import get_spark  # noqa: E402
from free_etl_spark.tables import load_table  # noqa: E402
import free_etl_spark.queries as q  # noqa: E402


def old_form(spark, sf_dir):
    from free_etl_spark.operators.prefix import global_ntile

    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("gmax"))
    cust = (
        o.join(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("gmax"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
    )
    scored = cust
    for alias, order in (
        ("r", [F.asc("recency_days"), F.col("o_custkey")]),
        ("f", [F.desc("frequency"), F.col("o_custkey")]),
        ("m", [F.desc("monetary"), F.col("o_custkey")]),
    ):
        scored = global_ntile(
            scored, order, 5, alias, cache_tag=f"rfm_old_{alias}"
        )
    scored = scored.select("o_custkey", "r", "f", "m", "monetary")
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("total_monetary"),
    )


def run(fn, *args) -> float:
    t0 = time.time()
    fn(*args).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-rfm")
    spark.range(1000).count()
    load_table(spark, sf_dir, "orders").count()
    new_fn = q.QUERIES["orders_rfm_segmentation"]
    run(old_form, spark, sf_dir)  # warm both
    run(new_fn, spark, sf_dir)
    olds, news = [], []
    for i in range(passes):
        olds.append(run(old_form, spark, sf_dir))
        news.append(run(new_fn, spark, sf_dir))
        print(f"pass {i}: old {olds[-1]:.3f}s  new {news[-1]:.3f}s",
              flush=True)
    print(f"old best {min(olds):.3f} med {sorted(olds)[len(olds)//2]:.3f}")
    print(f"new best {min(news):.3f} med {sorted(news)[len(news)//2]:.3f}")
    print(f"new wins {sum(1 for o, n in zip(olds, news) if n < o)}/{passes}")
    spark.stop()


if __name__ == "__main__":
    main()
