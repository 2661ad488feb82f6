"""As-of (backward) join — an operator Spark lacks as a builtin
(SURVEY.md §2B "as-of join").

Implementation is the scalable union-and-carry-forward pattern rather
than a per-key nested-loop: tag both inputs, union them, and within
each key partition ordered by time let ``last(<right payload>,
ignorenulls=True)`` carry the most recent right-side row forward onto
each left row. Cost: ONE shuffle of (|L|+|R|) rows on the join key —
no row explosion, no driver loops — so it holds at 100 TB where a
range-join would quadratically explode on hot keys.

Tie rules: a right row with ts equal to the left row's ts matches
(``<=`` semantics, like pandas ``merge_asof`` / DuckDB ``ASOF JOIN``):
right rows sort before left rows at equal timestamps. Among *multiple*
right rows sharing the same (key, ts) — where a distributed table has
no "last row in input order" to prefer — the greatest payload struct
wins, making the result deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
    tolerance: int | float | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with the same ``on`` keys and ``right[right_ts] <= left[left_ts]``.

    Returns the left DataFrame with ``{payload_prefix}{right_ts}`` and
    ``{payload_prefix}{c}`` for each payload column (NULL when no right
    row precedes the left row).

    ``tolerance`` (same units as the ts columns, like pandas
    ``merge_asof(tolerance=...)``): when set, a carried match further
    than ``tolerance`` behind the left row is masked back to NULL — a
    pure post-projection on the carried struct, so the plan (one
    shuffle, no explosion) is unchanged.
    """
    lcols = left.columns
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in payload_cols]
    )

    tagged_r = right.select(
        *[F.col(k).alias(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts first at ts ties → '<=' semantics
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    tagged_l = left.select(
        *[F.col(k).alias(k) for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in lcols if c not in on],
    )

    w = (
        Window.partitionBy(*on)
        # __payload as the final sort key: deterministic winner among
        # right rows tied on (key, ts) — nulls (left rows) sort first
        # within their (__ts, __side) group, which is irrelevant since
        # all side=1 payloads are null
        .orderBy("__ts", "__side", "__payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        in_tol = F.col("__ts") - F.col(f"__match.{right_ts}") <= F.lit(tolerance)
        carried = carried.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        )
    out = carried.filter(F.col("__side") == 1).select(
        *lcols,
        F.col(f"__match.{right_ts}").alias(f"{payload_prefix}{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"{payload_prefix}{c}") for c in payload_cols],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Forward as-of: for each left row, the payload of the EARLIEST
    right row with the same keys and ``right[right_ts] >= left[left_ts]``
    (the "next quote/event" lookup). Same union-and-carry pattern as
    backward, scanning the window from the future side: one shuffle of
    |L|+|R| rows. Ties: a right row at the left row's exact ts matches;
    among duplicate right (key, ts) rows the smallest payload struct
    wins (mirror-image of the backward tie rule, deterministic)."""
    lcols = left.columns
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in payload_cols]
    )

    tagged_r = right.select(
        *[F.col(k).alias(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # right sorts after left at ts ties → '>=' matches
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    tagged_l = left.select(
        *[F.col(k).alias(k) for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in lcols if c not in on],
    )

    w = (
        Window.partitionBy(*on)
        # ascending payload: among right rows tied on (key, ts) the
        # first() seen scanning forward is the smallest payload struct
        .orderBy("__ts", "__side", "__payload")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = tagged_r.unionByName(tagged_l).withColumn(
        "__match", F.first("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 0).select(
        *lcols,
        F.col(f"__match.{right_ts}").alias(f"{payload_prefix}{right_ts}"),
        *[F.col(f"__match.{c}").alias(f"{payload_prefix}{c}") for c in payload_cols],
    )
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Nearest as-of (pandas ``merge_asof(direction='nearest')``
    parity): for each left row, the right row minimizing
    ``|right_ts - left_ts|`` within the same keys; ties (equal
    distance on both sides) resolve to the BACKWARD match. Composes
    the backward and forward passes — two shuffles of |L|+|R| rows,
    still no row explosion. Callers wanting single-row determinism
    under duplicate right (key, ts) rows should pre-aggregate the
    right side (the registered query does)."""
    b = asof_join_backward(
        left, right, on, left_ts, right_ts, payload_cols, payload_prefix="__b_"
    )
    bf = asof_join_forward(
        b, right, on, left_ts, right_ts, payload_cols, payload_prefix="__f_"
    )
    b_ts, f_ts = f"__b_{right_ts}", f"__f_{right_ts}"
    pick_b = F.col(b_ts).isNotNull() & (
        F.col(f_ts).isNull()
        | ((F.col(left_ts) - F.col(b_ts)) <= (F.col(f_ts) - F.col(left_ts)))
    )
    out_cols = [F.col(c) for c in left.columns]
    for c in [right_ts] + payload_cols:
        out_cols.append(
            F.when(pick_b, F.col(f"__b_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(f"{payload_prefix}{c}")
        )
    return bf.select(*out_cols)
