"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config here is chosen to also hold on a large multi-executor cluster:
AQE for runtime re-planning (skew joins, partition coalescing),
filter pushdown / pruning left on, Arrow for any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def default_driver_memory() -> str:
    """Driver heap default: min(32g, ~half of MemAvailable), floor 2g.

    32g is the sweet spot on this 128 GiB sandbox (32 concurrent local
    tasks persisting shingle/band relations GC-thrash an 8g heap —
    r3 bench: 4-18s variance on identical warm work), but a fixed 32g
    fails to launch the JVM outright on smaller hosts. Override with
    SPARK_GRAFT_DRIVER_MEM."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(32, avail_gb // 2))}g"
    except OSError:
        pass
    return "8g"  # conservative when host memory is unknowable


def get_spark(
    app_name: str = "free-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores; a real cluster would size this to
        # ~2-3x total executor cores (or rely on AQE coalescing from a
        # higher initial value).
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # the driver-generated events table stores TIMESTAMP(NANOS)
        # which Spark's parquet reader rejects by default
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # host-derived heap (32g on this sandbox): the single-JVM
        # stand-in for per-executor memory on a real cluster — NOT a
        # cluster-mode setting. See default_driver_memory.
        .config("spark.driver.memory", default_driver_memory())
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
