"""Scalar-function surface (SURVEY.md §2.8): string (R14), datetime
(R15), math/cast (R16), array (E25), JSON (E26), conditional (E27).

Each query exercises a family end-to-end through the parquet scan so
the driver's hash gate pins cross-engine semantics (regex dialects,
rounding, null handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ccxt_ohlcv_fetcher_spark.functions.arrays import cosine_similarity, l2_norm
from ccxt_ohlcv_fetcher_spark.plans.registry import dec, ms, register, sql_ms
from ccxt_ohlcv_fetcher_spark.schemas import EVENT_PROPS_SCHEMA
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


@register(
    "part_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           replace(p_name, ' ', '_') AS name_underscored,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
    doc="String functions (op R14): the reference's symbol normalization "
    "replace (ccxt-ohlcv-fetch.py:135), format/pad (:169-172), regex "
    "extract (:142-143) over a real column mix.",
    tags=("R14",),
)
def part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_underscored"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "order_datetime_funcs",
    oracle=f"""
    SELECT o_orderkey,
           {sql_ms("o_orderdate")} AS epoch_ms,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso
    FROM orders
    """,
    doc="Datetime functions (op R15): epoch-ms round trip (:60,:151-152), "
    "ISO formatting (:83,:284), calendar truncation and interval "
    "arithmetic (:159-163) — all UTC (fixes the reference's naive-local "
    "quirk).",
    tags=("R15", "R11"),
)
def order_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        ms("o_orderdate").alias("epoch_ms"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("iso"),
    )


@register(
    "lineitem_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 + CAST(l_tax AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS taxed_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           greatest(l_quantity, 10.0) AS qty_floor10,
           CASE WHEN l_quantity > 25 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS qty_class
    FROM lineitem
    """,
    doc="Math/cast (op R16: int cast :60, rate scaling :227-228) and "
    "conditional when/otherwise (op E27).",
    tags=("R16", "E27"),
)
def lineitem_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty_int"),
        # decimal multiply + decimal round: double round() disagrees across
        # engines on representation boundaries (e.g. x.275 -> .28 vs .27)
        F.round(dec("l_extendedprice") * (F.lit(1) + dec("l_tax")), 2)
        .cast("double")
        .alias("taxed_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_bucket"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floor10"),
        F.when(F.col("l_quantity") > 25, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
    )


@register(
    "event_props_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY 1
    """,
    doc="JSON extraction (op E26): from_json with a declared schema "
    "(schema-on-read stays declarative; no inference on the hot path), "
    "then exact integer aggregation.",
    tags=("E26",),
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", EVENT_PROPS_SCHEMA)["k"]
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "embedding_array_funcs",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')
                AS DOUBLE) AS comp_sum,
           CAST(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                x -> x * x), 'sum')) AS DOUBLE) AS l2,
           round(CAST(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                x -> x * x), 'sum') AS DOUBLE), 6) AS sq_sum_r
    FROM embeddings
    """,
    doc="Array higher-order functions (op E25): size/element_at/aggregate/"
    "transform over array<float>, all JVM-side (whole-stage codegen; no "
    "Python UDF).",
    tags=("E25",),
)
def embedding_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double")).alias(
            "comp_sum"
        ),
        F.sqrt(sq_sum).alias("l2"),
        F.round(sq_sum, 6).alias("sq_sum_r"),
    )


@register(
    "acctbal_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
             AS bal_or_zero,
           CAST(c_acctbal IS NULL AS INT) AS bal_is_null
    FROM customer
    """,
    doc="Conditional/null functions (op E27): coalesce/nullif/when — the "
    "reference's None-handling at ccxt-ohlcv-fetch.py:88-91,276-279 as "
    "column expressions.",
    tags=("E27",),
)
def acctbal_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    bal_nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return customer.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        bal_nonneg.alias("bal_nonneg"),
        F.coalesce(bal_nonneg, F.lit(0.0)).alias("bal_or_zero"),
        F.col("c_acctbal").isNull().cast("int").alias("bal_is_null"),
    )


@register(
    "part_name_token_extract",
    oracle="""
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), ',')
             AS words,
           CAST(len(regexp_extract_all(p_name, '([a-z]+)', 1)) AS INT)
             AS n_words,
           array_to_string(regexp_extract_all(p_type, '([A-Z]+)', 1), '|')
             AS caps
    FROM part
    """,
    doc="regexp_extract_all (op R14 generalized): all-match extraction to "
    "array<string>, joined to a string for the hash gate. The regex runs "
    "JVM-side inside whole-stage codegen — same cost model as "
    "regexp_extract, one pass per row.",
    tags=("R14",),
)
def part_name_token_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    words = F.regexp_extract_all("p_name", F.lit(r"([a-z]+)"), 1)
    return part.select(
        "p_partkey",
        F.array_join(words, ",").alias("words"),
        F.size(words).alias("n_words"),
        F.array_join(F.regexp_extract_all("p_type", F.lit(r"([A-Z]+)"), 1), "|").alias(
            "caps"
        ),
    )


@register(
    "event_props_map_ops",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) + 1 AS INT) AS n_keys2,
           array_to_string(list_sort(list_append(json_keys(props), 'type_len')), ',')
             AS keys2_sorted,
           CAST(length(event_type) AS BIGINT) AS type_len
    FROM events
    """,
    doc="Map functions (op E26): JSON parsed to map<string,bigint> with a "
    "declared value type (no schema inference), then map_keys / "
    "element_at / map_concat / create_map. The oracle works key-wise on "
    "the JSON since DuckDB's MAP is a different type family; both sides "
    "emit sorted-key strings so the comparison is layout-independent.",
    tags=("E26",),
)
def event_props_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # stage the parse: inlining the from_json expression into every
    # consumer makes CollapseProject duplicate it (6 parses per row in
    # the physical plan); two explicit Projects parse once — ~2x wall
    # time on this query (PERFORMANCE.md §6)
    base = events.select(
        "event_id",
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("_m"),
    ).withColumn(
        "_e",
        F.map_concat(
            F.col("_m"),
            F.create_map(F.lit("type_len"), F.length("event_type").cast("bigint")),
        ),
    )
    return base.select(
        "event_id",
        F.size(F.map_keys("_m")).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("_m")), ",").alias("keys_sorted"),
        F.element_at("_m", "k").alias("k_val"),
        F.size(F.map_keys("_e")).alias("n_keys2"),
        F.array_join(F.array_sort(F.map_keys("_e")), ",").alias("keys2_sorted"),
        F.element_at("_e", "type_len").alias("type_len"),
    )


@register(
    "event_props_map_entries",
    oracle="""
    SELECT event_id,
           CAST(len(list_filter(json_keys(props),
                k -> CAST(json_extract(props, '$.' || k) AS BIGINT) % 2 = 0))
             AS INT) AS n_even,
           coalesce(array_to_string(list_sort(list_filter(json_keys(props),
                k -> CAST(json_extract(props, '$.' || k) AS BIGINT) % 2 = 0)), ','),
                '') AS even_keys,
           CAST(list_aggregate(list_transform(json_keys(props),
                k -> CAST(json_extract(props, '$.' || k) AS BIGINT)), 'sum')
             AS BIGINT) AS val_sum
    FROM events
    """,
    doc="Map entries round-trip (op E26 long tail): map_entries -> "
    "entry-level filter (keep even values) -> map_from_entries back to "
    "a map, plus an entries-HOF value sum — the decompose/recompose "
    "pattern for map surgery that key-wise functions can't express. "
    "The oracle re-derives entries key-wise from the JSON (DuckDB's MAP "
    "is a different type family).",
    tags=("E26",),
)
def event_props_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id", F.from_json("props", "map<string,bigint>").alias("_m")
    ).withColumn(
        "_kept",
        F.map_from_entries(
            F.filter(F.map_entries("_m"), lambda e: e["value"] % 2 == 0)
        ),
    )
    return base.select(
        "event_id",
        F.size(F.map_keys("_kept")).alias("n_even"),
        F.array_join(F.array_sort(F.map_keys("_kept")), ",").alias("even_keys"),
        F.aggregate(
            F.map_entries("_m"),
            F.lit(0).cast("bigint"),
            lambda acc, e: acc + e["value"],
        ).alias("val_sum"),
    )


_STOPWORDS = ("the", "a", "and", "of", "data", "spark")


@register(
    "doc_token_setops",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT {list(_STOPWORDS)!r}::VARCHAR[] AS stop)
    SELECT doc_id,
           coalesce(array_to_string(
               list_sort(list_distinct(list_intersect(toks, stop))), ','), '')
             AS stop_hits,
           CAST(len(list_distinct(
               list_filter(toks, x -> NOT list_contains(stop, x)))) AS INT)
             AS n_content,
           CAST(len(list_distinct(list_concat(toks, stop))) AS INT) AS n_union,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(toks, x -> NOT list_contains(stop, x))))[1:5], ','), '')
             AS content5
    FROM t, s
    """,
    doc="Array set operations (op E25): array_intersect / array_except / "
    "array_union between a token array and a broadcast-literal stopword "
    "array. Set ops return distinct elements in first-array order, so "
    "both sides sort before joining to a string. At scale this is pure "
    "codegen per row — no shuffle, no UDF.",
    tags=("E25", "E36"),
)
def doc_token_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array([F.lit(s) for s in _STOPWORDS])
    content = F.array_distinct(F.array_except(toks, stop))
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(toks, stop)), ",").alias(
            "stop_hits"
        ),
        F.size(content).alias("n_content"),
        F.size(F.array_distinct(F.array_union(toks, stop))).alias("n_union"),
        F.array_join(F.slice(F.array_sort(content), 1, 5), ",").alias("content5"),
    )
