"""Custom stateful streaming operator (SURVEY.md §2B "stateful dedup /
late data" row, applyInPandasWithState variant): per-user running
aggregates with explicit GroupState, the shape used for custom session
logic / online features that windowed aggs can't express.

State is one (count, sum) tuple per user_id. Each micro-batch the
operator folds its pandas chunks into the state and emits the updated
running totals (update mode). Because emissions are cumulative and
monotone, the *final* value per user — recovered with a max() over the
memory-sink rows — equals the batch GROUP BY, which is the oracle; the
check holds regardless of how AvailableNow slices micro-batches.

Scale: state lives in the state store partitioned by user_id (RocksDB
on a real cluster); each micro-batch shuffles only its own rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from free_etl_spark.registry import query
from free_etl_spark.streaming.windows import events_stream, run_to_completion

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, total double"


def _running_totals(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [total]}
    )


@query(
    "streaming_stateful_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running per-user totals over the event
    stream; final per-user emission must equal the batch GROUP BY."""
    ev = events_stream(spark, sf_dir).select("user_id", "value")
    updates = ev.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_completion(updates, "update")
    # n_events strictly increases per emission → the struct-max picks
    # the final (n_events, sum_value) pair even if values were negative
    final = F.max(F.struct("n_events", "sum_value")).alias("f")
    return (
        out.groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("f.n_events").alias("n_events"),
            F.round(F.col("f.sum_value"), 2).alias("sum_value"),
        )
    )
