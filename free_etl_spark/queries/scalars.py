"""Scalar expression coverage: string / date / math / JSON / array
functions — all JVM-side builtins (whole-stage codegen, no Python in
the row path). Casts pin types where Spark and DuckDB defaults differ
(Spark length()→INT vs DuckDB BIGINT, Spark ceil()→BIGINT vs DuckDB
DOUBLE, …). (SURVEY.md §2B "scalar fns".)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT)                          AS text_len,
           UPPER(SUBSTR(text, 1, 12))                            AS head_upper,
           REPLACE(SUBSTR(text, 1, 30), ' ', '_')                AS head_snake,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, 'a', '')) AS BIGINT) AS a_count,
           CAST(STRPOS(text, 'data') AS BIGINT)                  AS data_pos,
           TRIM(CONCAT('  ', lang, '  '))                        AS lang_trim,
           LPAD(source, 8, '0')                                  AS source_pad,
           REVERSE(SUBSTR(text, 1, 6))                           AS head_rev
    FROM documents
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.replace(F.substring("text", 1, 30), F.lit(" "), F.lit("_")).alias(
            "head_snake"
        ),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("a"))))
        .cast("long")
        .alias("a_count"),
        F.instr("text", "data").cast("long").alias("data_pos"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
        F.lpad("source", 8, "0").alias("source_pad"),
        F.reverse(F.substring("text", 1, 6)).alias("head_rev"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)     AS order_year,
           CAST(month(o_orderdate) AS BIGINT)    AS order_month,
           CAST(day(o_orderdate) AS BIGINT)      AS order_day,
           CAST(quarter(o_orderdate) AS BIGINT)  AS order_quarter,
           date_trunc('month', o_orderdate)      AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice), 6)           AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6)         AS price_ln,
           ROUND(POWER(1 + l_discount, 3), 6)        AS disc_pow,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT)  AS price_kceil,
           CAST(FLOOR(l_quantity / 7) AS BIGINT)     AS qty_bucket,
           ABS(l_tax - l_discount)                   AS tax_disc_gap,
           l_orderkey % 7                            AS key_mod,
           GREATEST(l_tax, l_discount)               AS max_rate,
           LEAST(l_tax, l_discount)                  AS min_rate,
           ROUND(SIN(l_quantity), 6)                 AS qty_sin
    FROM lineitem
    WHERE l_orderkey % 5 = 0
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 5 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1, F.lit(3)), 6).alias("disc_pow"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_kceil"),
        F.floor(F.col("l_quantity") / 7).cast("long").alias("qty_bucket"),
        F.abs(F.col("l_tax") - F.col("l_discount")).alias("tax_disc_gap"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.round(F.sin("l_quantity"), 6).alias("qty_sin"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 AS k_parity
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(
            "event_id",
            k.alias("k_val"),
            (k % 2).alias("k_parity"),
        )
        .filter(F.col("k_val") >= 50)
    )


@query(
    "array_norms",
    oracle="""
    SELECT vec_id, label,
           CAST(LEN(embedding) AS BIGINT) AS dims,
           CAST(embedding[1] AS DOUBLE)   AS first_val,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           ROUND(list_sum(list_transform(embedding,
                 x -> ABS(CAST(x AS DOUBLE)))), 6)                 AS l1_norm,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE)        AS max_val
    FROM embeddings
    """,
)
def array_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array (vector) column functions: higher-order fold for L1/L2
    norms, element access, array max — all JVM-side, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    l1 = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double"))
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dims"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.round(F.sqrt(sq), 6).alias("l2_norm"),
        F.round(l1, 6).alias("l1_norm"),
        F.array_max("embedding").cast("double").alias("max_val"),
    )


@query(
    "scalar_timezone_funcs",
    oracle="""
    SELECT local_hour, COUNT(*) AS n
    FROM (
      SELECT CAST(EXTRACT(hour FROM
               timezone('America/New_York', timezone('UTC', CAST(ts AS TIMESTAMP))))
             AS INT) AS local_hour
      FROM events
    )
    GROUP BY local_hour
    """,
)
def scalar_timezone_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion parity: UTC event times shifted to a named
    IANA zone (DST-aware on both engines), bucketed by local hour.
    Spark side: from_utc_timestamp on the NTZ event time."""
    ev = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts").cast("timestamp"), "America/New_York")
    return (
        ev.select(F.hour(local).cast("int").alias("local_hour"))
        .groupBy("local_hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "scalar_null_safe_eq",
    oracle="""
    SELECT same_props, COUNT(*) AS n
    FROM (
      SELECT (json_extract_string(a.props, '$.k')
              IS NOT DISTINCT FROM json_extract_string(b.props, '$.k')) AS same_props
      FROM events a JOIN events b ON a.event_id = b.event_id + 1
    )
    GROUP BY same_props
    """,
)
def scalar_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality (<=> / IS NOT DISTINCT FROM): compare each
    event's props.k with its predecessor's — NULL <=> NULL is TRUE,
    NULL <=> x is FALSE, so every pair lands in a bucket (plain = would
    drop NULL comparisons to UNKNOWN)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    a = ev.select(F.col("event_id").alias("ida"), k.alias("ka"))
    b = ev.select((F.col("event_id") + 1).alias("idb"), k.alias("kb"))
    return (
        a.join(b, F.col("ida") == F.col("idb"))
        .select(F.col("ka").eqNullSafe(F.col("kb")).alias("same_props"))
        .groupBy("same_props")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT event_id,
           CAST(event_id & 255 AS BIGINT)        AS low_byte,
           CAST(event_id | 4096 AS BIGINT)       AS set_bit,
           CAST(xor(event_id, user_id) AS BIGINT) AS xored,
           CAST(event_id << 2 AS BIGINT)         AS shl2,
           CAST(event_id >> 3 AS BIGINT)         AS shr3,
           CAST(bit_count(event_id) AS INT)      AS popcount
    FROM events WHERE event_id % 100 = 0
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar coverage (AND/OR/XOR/shifts/popcount) — the
    primitive layer hash-partitioners, bloom filters, and bitmap
    indexes are built from. Pure map-side codegen expressions."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("set_bit"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(F.col("event_id"), 2).alias("shl2"),
        F.shiftright(F.col("event_id"), 3).alias("shr3"),
        F.bit_count("event_id").alias("popcount"),
    )


@query(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_int,
           json_extract_string(props, '$.k')                  AS k_str,
           json_extract_string(props, '$.missing')            AS missing_val,
           CASE WHEN json_valid(props) THEN 'OBJECT' END      AS top_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 10 AND 60
    """,
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type over the events.props JSON payload:
    ``parse_json`` once into the binary Variant encoding, then typed
    ``variant_get`` path extraction. At 100 TB this is the
    semi-structured hot path — Variant decodes the JSON text a single
    time into a shredded binary form instead of re-parsing the string
    per extracted field (``get_json_object`` re-parses per call), and
    the whole pipeline stays in whole-stage codegen. The oracle
    replays the same paths with DuckDB's JSON extractors."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    out = ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "string").alias("missing_val"),
        F.schema_of_variant(v).alias("top_type"),
    )
    # schema_of_variant returns e.g. 'OBJECT<k: BIGINT>' — reduce to
    # the top-level kind so the oracle is engine-agnostic
    return out.withColumn(
        "top_type", F.regexp_extract("top_type", r"^(\w+)", 1)
    ).filter(F.col("k_int").between(10, 60))


@query(
    "scalar_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(LEN(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           LEN(list_filter(embedding, x -> x > 0.9)) > 0            AS has_big,
           LEN(list_filter(embedding, x -> NOT (x < 1.0))) = 0      AS all_lt1,
           ROUND(list_sum(list_transform(embedding[1:8],
                 x -> ABS(CAST(x AS DOUBLE)))), 4)                  AS head_l1
    FROM embeddings
    """,
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions — filter, exists, forall,
    transform over a slice — all lambda expressions evaluated
    JVM-side (no Python), the idiom for per-row array logic at
    100 TB. Complements array_norms' aggregate/zip_with folds."""
    emb = load_table(spark, sf_dir, "embeddings")
    col = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(F.filter(col, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(col, lambda x: x > 0.9).alias("has_big"),
        F.forall(col, lambda x: x < 1.0).alias("all_lt1"),
        F.round(
            F.aggregate(
                F.transform(F.slice(col, 1, 8), lambda x: F.abs(x.cast("double"))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("head_l1"),
    )


@query(
    "scalar_conditional_funcs",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                                 AS bal_band,
           ROUND(LEAST(c_acctbal, 1000.0), 2)                   AS capped,
           ROUND(GREATEST(c_acctbal, 0.0), 2)                   AS floored,
           CASE WHEN c_nationkey IS NOT NULL
                THEN 'known' ELSE 'unknown' END                 AS nation_known
    FROM customer
    """,
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-handling scalar functions: coalesce, nullif,
    CASE bands, least/greatest clamps, nvl2 — all codegen branches,
    no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.round(F.least("c_acctbal", F.lit(1000.0)), 2).alias("capped"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("floored"),
        F.nvl2("c_nationkey", F.lit("known"), F.lit("unknown")).alias(
            "nation_known"
        ),
    )


@query(
    "scalar_collation_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_mktsegment) = 'building'           AS is_building_ci,
           lower(c_name) LIKE lower('%CUSTOMER%')     AS name_has_word_ci,
           lower(c_mktsegment) IN ('machinery', 'household') AS seg_in_ci
    FROM customer
    """,
)
def scalar_collation_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string comparison (Spark 4 collations): the
    UTF8_LCASE collation makes =, IN and contains case-insensitive
    without materializing lower() copies — at 100 TB that keeps the
    comparison inside codegen and lets the optimizer keep pushing the
    predicate. The oracle replays the semantics with explicit lower()
    (UTF8_LCASE ≡ lowercase-then-compare for ASCII data like this)."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.collate(F.col("c_mktsegment"), "UTF8_LCASE")
    name = F.collate(F.col("c_name"), "UTF8_LCASE")
    return c.select(
        "c_custkey",
        (seg == F.lit("building")).alias("is_building_ci"),
        F.contains(name, F.lit("CUSTOMER")).alias("name_has_word_ci"),
        seg.isin("machinery", "household").alias("seg_in_ci"),
    )


@query(
    "scalar_url_funcs",
    oracle="""
    SELECT doc_id,
           'src' || (doc_id % 20) || '.example.com'            AS host,
           '/' || lang || '/' || doc_id                         AS path,
           'q=' || lang                                         AS query_str,
           lang                                                 AS q_param,
           'a+b%2Bc'                                            AS enc
    FROM documents
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing functions — the domain-extraction primitive behind
    URL-based corpus filtering (blocklists, per-domain quotas).
    The corpus has no URL column, so a deterministic URL is built per
    document and parsed back with parse_url (HOST/PATH/QUERY and a
    keyed query parameter) plus url_encode; the oracle reconstructs
    each component with plain string arithmetic, so any parse_url
    deviation from RFC component splitting breaks the hash. JVM
    codegen end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://src"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_str"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.url_encode(F.lit("a b+c")).alias("enc"),
    )


@query(
    "scalar_try_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE FLOOR(o_totalprice * 100 / (o_orderkey % 7)) / 100 END
             AS safe_div,
           TRY_CAST(o_orderpriority AS INT) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(FLOOR(o_totalprice) AS BIGINT) % (o_orderkey % 3) END
             AS safe_mod
    FROM orders
    WHERE o_orderkey <= 100
    """,
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (try_divide / try_cast / try_mod —
    Spark 3.5/4's ANSI-mode companions): failures that would abort a
    100 TB job under ANSI semantics (division by zero, unparseable
    casts, modulo zero) degrade to NULL per-row, which is what a
    curation pipeline wants for dirty columns — quarantine the row,
    not kill the job. Map-only; DuckDB mirrors with TRY_CAST and
    NULL-guarding CASE (its /0 and %0 raise, exactly the behavior
    try_* exists to absorb). safe_mod's integer part goes through
    FLOOR on both engines (Spark's bigint cast truncates, DuckDB's
    rounds — the recurring cross-engine cast trap); keys<=100 bound
    the output."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 100
    )
    return orders.select(
        "o_orderkey",
        (
            F.floor(
                F.try_divide(
                    F.col("o_totalprice") * 100, F.col("o_orderkey") % 7
                )
            )
            / 100
        ).alias("safe_div"),
        F.try_to_number("o_orderpriority", F.lit("999")).cast("int").alias(
            "bad_cast"
        ),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        F.try_mod(
            F.floor("o_totalprice").cast("bigint"), F.col("o_orderkey") % 3
        ).alias("safe_mod"),
    )


@query(
    "scalar_regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)-([a-z]+)', 1) AS first_hyphen_head,
           CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
             AS n_number_runs,
           COALESCE(array_to_string(regexp_extract_all(substr(text, 1, 120),
                                                        '[A-Z][a-z]+'), ','),
                    '') AS capitalized_head,
           regexp_matches(text, '(data|model|train)') AS mentions_ml,
           CAST(LENGTH(regexp_replace(text, '[aeiou]', '*', 'g'))
                AS BIGINT) AS len_starred,
           CASE WHEN regexp_matches(text, '[0-9][0-9]')
                THEN CAST(strpos(text, regexp_extract(text, '[0-9][0-9]'))
                          AS BIGINT)
                ELSE 0 END AS first_2digit_pos
    FROM documents
    """,
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar family: extract / extract_all / count / like /
    replace-all / instr, kept to POSIX character classes so the Java
    (Spark) and RE2-ish (DuckDB) dialects agree. DuckDB spells some
    differently (count = LEN(extract_all); replace needs the 'g'
    flag where Spark replaces all by default; instr = guarded
    strpos-of-first-match, exact because the regex match is
    leftmost; array_to_string of an empty list is NULL where Spark's
    array_join is '' — COALESCEd). All map-side, codegen'd,
    shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)-([a-z]+)", 1).alias(
            "first_hyphen_head"
        ),
        F.regexp_count("text", F.lit(r"[0-9]+"))
        .cast("long")
        .alias("n_number_runs"),
        F.array_join(
            F.regexp_extract_all(
                F.substring("text", 1, 120), F.lit(r"[A-Z][a-z]+")
            ),
            ",",
        ).alias("capitalized_head"),
        F.col("text").rlike(r"(data|model|train)").alias("mentions_ml"),
        F.length(F.regexp_replace("text", r"[aeiou]", "*"))
        .cast("long")
        .alias("len_starred"),
        F.regexp_instr("text", F.lit(r"[0-9][0-9]"))
        .cast("long")
        .alias("first_2digit_pos"),
    )


@query(
    "scalar_xpath_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS xp_key,
           ROUND(o_totalprice, 2) AS xp_price,
           o_orderstatus AS xp_status,
           CAST(2 AS BIGINT) AS n_items,
           TRUE AS all_match
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
)
def scalar_xpath_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath scalar family (xpath_long / xpath_double / xpath_string
    / xpath over node-sets) — the XML-extraction surface legacy
    enterprise feeds need: each order is serialized to an XML
    fragment and every field is recovered via XPath, plus a
    node-set count over repeated <i> elements. The oracle pins the
    ROUNDTRIP (extracted values equal the originals, count equals
    the constructed arity) — DuckDB has no XPath, so the invariant
    IS the value-level check, same contract as the crypto/bitmap
    audits. Map-only JVM evaluation."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"),
        F.round("o_totalprice", 2).cast("string"),
        F.lit("</p><s>"),
        F.col("o_orderstatus"),
        F.lit("</s><i>a</i><i>b</i></o>"),
    )
    w = o.select("o_orderkey", "o_totalprice", "o_orderstatus", xml.alias("xml"))
    xp_key = F.expr("xpath_long(xml, '/o/k')")
    xp_price = F.expr("xpath_double(xml, '/o/p')")
    xp_status = F.expr("xpath_string(xml, '/o/s')")
    n_items = F.expr("size(xpath(xml, '/o/i/text()'))").cast("long")
    return (
        w.select(
            "o_orderkey",
            xp_key.alias("xp_key"),
            xp_price.alias("xp_price"),
            xp_status.alias("xp_status"),
            n_items.alias("n_items"),
            (
                (xp_key == F.col("o_orderkey"))
                & (xp_price == F.round("o_totalprice", 2))
                & (xp_status == F.col("o_orderstatus"))
                & (n_items == 2)
            ).alias("all_match"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_format_funcs",
    oracle="""
    SELECT o_orderkey,
           printf('%012.2f', ROUND(o_totalprice, 2)) AS padded_price,
           printf('ORD-%08d', o_orderkey) AS order_tag,
           ROUND(o_totalprice, 2) AS reparsed,
           TRUE AS roundtrip_ok
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
)
def scalar_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric formatting family: printf-style format_string (both
    engines implement C semantics, so the BYTES match), plus the
    to_char/to_number pattern pair — format a money value with an
    explicit digit mask and parse it back, pinning the roundtrip
    recovers the exact 2-decimal value (to_char grouping/locale
    behavior differs across engines, so the roundtrip invariant is
    the check while printf output is compared byte-for-byte).
    Map-only."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    price2 = F.round("o_totalprice", 2)
    padded = F.format_string("%012.2f", price2)
    tag = F.format_string("ORD-%08d", F.col("o_orderkey"))
    tochar = F.expr("to_char(round(o_totalprice, 2), '999999990.00')")
    reparsed = F.expr(
        "to_number(to_char(round(o_totalprice, 2), '999999990.00'),"
        " '999999990.00')"
    ).cast("double")
    return (
        o.select(
            "o_orderkey",
            padded.alias("padded_price"),
            tag.alias("order_tag"),
            reparsed.alias("reparsed"),
            (reparsed == price2).alias("roundtrip_ok"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_map_hof_funcs",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) * 10 AS base_x10,
           ROUND(ROUND(o_totalprice, 2) + o_orderkey, 2) AS zipped_sum,
           CAST(CASE WHEN ROUND(o_totalprice, 2) > 200000 THEN 1 ELSE 0
                END AS BIGINT) AS n_kept,
           'BASE,TAX' AS key_csv
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
)
def scalar_map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (transform_values, transform_keys,
    map_filter, map_zip_with, map_keys/map_values) — the typed-map
    manipulation surface for feature dictionaries and tag columns.
    Maps are constructed from known scalar fields, pushed through
    each HOF, and scalar results extracted back out, so the oracle
    states the closed form over the base columns (DuckDB's MAP has
    no lambda surface — the extraction equalities are the value
    check). All JVM-side, map-only."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    price2 = F.round("o_totalprice", 2)
    m = F.create_map(
        F.lit("base"), price2, F.lit("tax"), price2 * 0.1
    )
    m2 = F.create_map(F.lit("base"), F.col("o_orderkey").cast("double"))
    x10 = F.element_at(
        F.transform_values(m, lambda k, v: v * 10), F.lit("base")
    )
    zipped = F.element_at(
        F.map_zip_with(
            m, m2, lambda k, v1, v2: F.coalesce(v1, F.lit(0.0)) + F.coalesce(v2, F.lit(0.0))
        ),
        F.lit("base"),
    )
    kept = F.size(F.map_filter(m, lambda k, v: v > 200000))
    upper_keys = F.array_join(
        F.array_sort(
            F.map_keys(F.transform_keys(m, lambda k, v: F.upper(k)))
        ),
        ",",
    )
    return (
        o.select(
            "o_orderkey",
            x10.alias("base_x10"),
            F.round(zipped, 2).alias("zipped_sum"),
            kept.cast("long").alias("n_kept"),
            upper_keys.alias("key_csv"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_array_set_funcs",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             [o_orderkey % 5, o_orderkey % 7, o_orderkey % 9] AS a1,
             [o_orderkey % 5, o_orderkey % 3] AS a2
      FROM orders WHERE o_orderkey <= 100
    )
    SELECT o_orderkey,
           CAST(len(list_sort(list_distinct(list_concat(a1, a2))))
                AS BIGINT) AS n_union,
           CAST(len(list_sort(list_distinct(
                list_filter(a1, x -> list_contains(a2, x)))))
                AS BIGINT) AS n_intersect,
           CAST(len(list_sort(list_distinct(
                list_filter(a1, x -> NOT list_contains(a2, x)))))
                AS BIGINT) AS n_except,
           array_to_string(list_sort(list_distinct(list_concat(a1, a2))),
                           ',') AS union_csv,
           CAST(list_position(list_sort(a1), o_orderkey % 5)
                AS BIGINT) AS pos_of_mod5
    FROM a ORDER BY o_orderkey
    """,
)
def scalar_array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SET-operation family (array_union / array_intersect /
    array_except / array_position over sorted arrays) — the
    collection algebra tag/feature columns need. Values derive from
    key arithmetic so both engines build identical arrays; Spark's
    set functions dedup by definition and DuckDB replays them as
    sort-distinct-filter compositions. Sorted-CSV serialization
    avoids the array-vs-ndarray comparison trap (see
    array_agg_user_types). Map-only."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    a1 = F.array(
        F.col("o_orderkey") % 5, F.col("o_orderkey") % 7, F.col("o_orderkey") % 9
    )
    a2 = F.array(F.col("o_orderkey") % 5, F.col("o_orderkey") % 3)
    w = o.select("o_orderkey", a1.alias("a1"), a2.alias("a2"))
    return (
        w.select(
            "o_orderkey",
            F.size(F.array_union("a1", "a2")).cast("long").alias("n_union"),
            F.size(F.array_intersect("a1", "a2"))
            .cast("long")
            .alias("n_intersect"),
            F.size(F.array_except("a1", "a2")).cast("long").alias("n_except"),
            F.array_join(F.array_sort(F.array_union("a1", "a2")), ",").alias(
                "union_csv"
            ),
            F.array_position(
                F.array_sort("a1"), F.col("o_orderkey") % 5
            )
            .cast("long")
            .alias("pos_of_mod5"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "quality_schema_contract_check",
    oracle="""
    SELECT * FROM (VALUES
      ('o_orderkey', 'bigint', 'bigint', TRUE),
      ('o_custkey', 'bigint', 'bigint', TRUE),
      ('o_orderstatus', 'string', 'string', TRUE),
      ('o_totalprice', 'double', 'double', TRUE),
      ('o_orderdate', 'timestamp_ntz', 'timestamp_ntz', TRUE),
      ('o_orderpriority', 'string', 'string', TRUE),
      ('o_comment', 'string', '<missing>', FALSE)
    ) AS t(col_name, expected_type, actual_type, ok)
    """,
)
def quality_schema_contract_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema-contract enforcement: compare the orders table's ACTUAL
    read schema against a declared column/type contract and emit one
    verdict row per contract entry — the check a data-contract CI
    gate runs before allowing a producer deploy (the deliberately
    contracted-but-absent o_comment row exercises the missing-column
    path). Schema reflection is driver-side metadata (dtypes — no
    data scan at all); the verdict relation is contract-sized. The
    oracle pins the full expected report."""
    contract = [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
        ("o_comment", "string"),
    ]
    actual = dict(load_table(spark, sf_dir, "orders").dtypes)
    rows = [
        (
            col,
            want,
            actual.get(col, "<missing>"),
            actual.get(col, "<missing>") == want,
        )
        for col, want in contract
    ]
    return spark.createDataFrame(
        rows, "col_name string, expected_type string, actual_type string, ok boolean"
    )
