"""Generic single-pass table profiler: per-column null counts,
approximate distinct counts, and numeric min/max/mean for ANY
DataFrame — the reusable API behind the fixed quality_profile_orders
query.

One aggregate row computes every metric (map-side partials, one
shuffle of a single row), then unpivots to long format driver-side —
profiling a 100 TB table costs exactly one scan no matter how many
columns it has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_PROFILE_COLS = ["column", "metric", "value"]


def profile_table(df: DataFrame, approx_distinct_rsd: float = 0.05) -> DataFrame:
    """Return (column, metric, value) rows; values stringified so
    heterogeneous metrics share one schema. Metrics: n_rows (once,
    column='*'), null_count and approx_distinct per column, min/max/
    mean for numeric columns."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null__{c}")
        )
        aggs.append(
            F.approx_count_distinct(c, rsd=approx_distinct_rsd).alias(f"__dist__{c}")
        )
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).alias(f"__min__{c}"))
            aggs.append(F.max(c).alias(f"__max__{c}"))
            aggs.append(F.avg(c).alias(f"__mean__{c}"))

    row = df.agg(*aggs).first()
    spark = df.sparkSession
    out = [("*", "n_rows", str(row["__n_rows"]))]
    for f in df.schema.fields:
        c = f.name
        out.append((c, "null_count", str(row[f"__null__{c}"])))
        out.append((c, "approx_distinct", str(row[f"__dist__{c}"])))
        if isinstance(f.dataType, NumericType):
            out.append((c, "min", str(row[f"__min__{c}"])))
            out.append((c, "max", str(row[f"__max__{c}"])))
            out.append((c, "mean", str(row[f"__mean__{c}"])))
    return spark.createDataFrame(out, "column string, metric string, value string")
