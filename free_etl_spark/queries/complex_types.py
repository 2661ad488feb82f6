"""Complex-type and reshaping operators (SURVEY.md §2B "scalar
string/date/math/array/map/json fns" + reshaping): explode/unnest,
array aggregation, map columns, pivot/unpivot, exact percentiles and
histograms.

All JVM-side (no Python UDFs): explode and the array/map builders are
Catalyst expressions inside whole-stage codegen; pivot compiles to
conditional aggregation; percentiles use Spark's exact `percentile`
aggregate (matches DuckDB quantile_cont interpolation).

Scale notes: explode multiplies rows map-side before any shuffle —
downstream aggs see the exploded size, so the token query aggregates
to (token) keys immediately rather than materializing doc×token pairs
wide. Pivot uses an explicit value list (no extra distinct-values job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_EVENT_TYPES = ["click", "view", "purchase", "scroll", "hover"]


@query(
    "explode_top_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def explode_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode (UNNEST) + two aggregates: global token
    frequency and document frequency, top-50. The explode is map-side;
    the only shuffle carries (token) partial counts."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(50)
    )


@query(
    "array_agg_user_types",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
           CAST(len(list(DISTINCT event_type)) AS INT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def array_agg_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array: per-user sorted distinct event-type
    arrays — array construction as an aggregate. The array serializes
    to a '|'-joined string in the result so the cross-engine value
    compare is representation-independent (pandas renders Spark arrays
    as lists or ndarrays depending on Arrow; DuckDB as ndarrays)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("event_type"))).alias("types"),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


@query(
    "map_props_stats",
    oracle="""
    SELECT k_mod, COUNT(*) AS n, CAST(SUM(k_val) AS DOUBLE) / COUNT(*) AS avg_k
    FROM (
      SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
             CAST(json_extract(props, '$.k') AS DOUBLE) AS k_val
      FROM events
    )
    GROUP BY k_mod
    """,
)
def map_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props → MapType column (from_json as map<string,long>),
    element_at access, grouped stats — the map-column access path."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    k = F.element_at(m, "k")
    return (
        ev.select(
            (k % 10).alias("k_mod"),
            k.cast("double").alias("k_val"),
        )
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # sum-over-count: integer-valued k puts ROUND(AVG) on
            # engine-divergent boundaries (see tpch_q1 note)
            (F.sum("k_val").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


@query(
    "pivot_type_by_source",
    oracle=f"""
    SELECT lang,
           {", ".join(f"CAST(COUNT(CASE WHEN source = 'src{i}' THEN 1 END) AS BIGINT) AS src{i}" for i in range(4))}
    FROM documents
    GROUP BY lang
    """,
)
def pivot_type_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): documents per (lang, source) as one wide row
    per lang. Explicit pivot-value list avoids the extra distinct scan;
    compiles to conditional aggregation — a single shuffle on lang."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .pivot("source", [f"src{i}" for i in range(4)])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, metric, ROUND(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    WHERE c_custkey < 100
    """,
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via the melt/unpivot operator — the inverse
    reshaping of pivot; map-side only, no shuffle."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return (
        cust.select(
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .select("c_custkey", "metric", F.round("val", 2).alias("val"))
    )


@query(
    "percentiles_by_type",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile`
    aggregate ≡ DuckDB quantile_cont). At 100 TB swap for
    approx_percentile: one pass, mergeable sketches, no full sort."""
    ev = _t(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.99))")
    return ev.groupBy("event_type").agg(
        F.round(pct[0], 4).alias("p25"),
        F.round(pct[1], 4).alias("p50"),
        F.round(pct[2], 4).alias("p75"),
        F.round(pct[3], 4).alias("p99"),
    )


@query(
    "histogram_value_buckets",
    oracle="""
    SELECT CASE WHEN value < 0.0 THEN 0
                WHEN value >= 100.0 THEN 21
                ELSE CAST(FLOOR(value / 5.0) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value), 4) AS lo,
           ROUND(MAX(value), 4) AS hi
    FROM events
    GROUP BY 1
    """,
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the distributed
    histogram primitive (single shuffle on ≤22 bucket keys)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(20)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@query(
    "struct_nested_projection",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           o_orderpriority AS priority,
           ROUND(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000
    """,
)
def struct_nested_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a nested struct column then project fields back out —
    round-trips Catalyst's nested-field pruning (the optimized plan
    reads only the referenced struct fields)."""
    orders = _t(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("o_orderpriority").alias("priority"),
            F.round("o_totalprice", 2).alias("total"),
            F.col("o_orderstatus").alias("status"),
        ).alias("info"),
    )
    return nested.filter(
        (F.col("info.status") == "O") & (F.col("info.total") > 100000)
    ).select(
        "o_orderkey",
        F.col("info.yr").alias("yr"),
        F.col("info.priority").alias("priority"),
        F.col("info.total").alias("total"),
    )


@query(
    "agg_approx_percentiles",
    oracle="""
    SELECT event_type,
           COUNT(*) AS event_cnt,
           TRUE AS within_p25,
           TRUE AS within_p50,
           TRUE AS within_p75,
           TRUE AS within_p99
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the mergeable-sketch scale path for the
    exact percentiles_by_type above (one pass, bounded memory, no
    per-group sort). Sketch outputs are engine-specific, so the oracled
    surface is one `within_*` boolean per quantile: the sketch value
    must land within a relative tolerance of the exact interpolated
    percentile computed in the same query (5% for the quartiles, 35%
    for the p99 tail, matching the nearest-data-point vs interpolation
    gap on ~hundreds-of-samples groups), which the oracle asserts as
    constant TRUE alongside the group keys and exact counts."""
    ev = _t(spark, sf_dir, "events")
    pct = F.expr(
        "approx_percentile(value, array(0.25, 0.5, 0.75, 0.99), 10000)"
    )
    ex = F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.99))")

    def within(i: int, bound: float):
        return F.abs(pct[i] - ex[i]) <= bound * F.greatest(
            F.abs(ex[i]), F.lit(1e-9)
        )

    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        within(0, 0.05).alias("within_p25"),
        within(1, 0.05).alias("within_p50"),
        within(2, 0.05).alias("within_p75"),
        within(3, 0.35).alias("within_p99"),
    )


@query(
    "histogram_equidepth",
    oracle="""
    WITH t AS (
      SELECT o_totalprice AS v, o_orderkey AS k,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
               AS bucket
      FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS lo, MAX(v) AS hi
    FROM t GROUP BY bucket
    """,
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of order totals: 10
    buckets each holding the same row count, with the realized value
    range of each — the histogram form optimizers and drift monitors
    prefer over equi-width because every bucket is statistically
    meaningful regardless of skew. The NTILE global order runs
    through operators/prefix.global_ntile (range partition + prefix
    row number + closed-form bucket assignment), so unlike the SQL
    window form there is no single-task sort at any scale.
    o_orderkey breaks ties for a total order (registry rule)."""
    from free_etl_spark.operators.prefix import global_ntile

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), F.col("o_orderkey").alias("k")
    )
    t = global_ntile(
        orders,
        [F.col("v"), F.col("k")],
        10,
        "bucket",
        cache_tag="equidepth_price",
    )
    return t.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
