"""Oracle-breadth queries (SURVEY.md §2.8/§2.4 long tail): bitwise and
boolean aggregates, try_* error-handling functions, str_to_map,
posexplode / posexplode_outer generator shapes, width_bucket histogram
bucketing, and the histogram_numeric sketch (rows-only).

All pure JVM-side expressions — no Python UDFs; generators are
whole-stage-codegen `Generate` nodes, aggregates keep partial/final
map-side combine. Scale notes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.plans.registry import register, sql_ms
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


@register(
    "lineitem_bitwise_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_bit_and,
           CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_bit_or,
           CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_bit_xor,
           bool_and(l_discount <= 0.08) AS all_low_disc,
           bool_or(l_quantity > 45) AS any_bulk,
           median(l_extendedprice) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Bitwise (bit_and/bit_or/bit_xor) and boolean (bool_and/bool_or) "
    "aggregates plus exact median (op E17 long tail). All are "
    "commutative-associative (median via typed sort-agg), so Spark's "
    "partial/final split is exact; one shuffle on the 3-value group key.",
    tags=("E17",),
)
def lineitem_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen (r12): the exact-median partial buffer dominates; build it
    # cluster-wide instead of on the one scan task (0.98 -> 0.83 s solo)
    li = load_table(spark, sf_dir, "lineitem", widen=True)
    qty = F.col("l_quantity").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(qty).alias("qty_bit_and"),
        F.bit_or(qty).alias("qty_bit_or"),
        F.bit_xor(qty).alias("qty_bit_xor"),
        F.bool_and(F.col("l_discount") <= 0.08).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") > 45).alias("any_bulk"),
        F.median("l_extendedprice").alias("median_price"),
    )


@register(
    "part_try_funcs",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[8] AS word8,
           p_retailprice / nullif(p_size - 10, 0) AS price_per_excess,
           try_cast(regexp_extract(p_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           try_cast(substr(p_brand, 7) AS BIGINT) AS brand_num
    FROM part
    """,
    doc="try_* error-handling functions (op E27 long tail): try_element_at "
    "past the array end, try_divide by a zero-crossing denominator, "
    "try_cast of non-numeric text — all return NULL instead of raising, "
    "the column-expression form of the reference's try/except-and-continue "
    "(ccxt-ohlcv-fetch.py:71-79). Row-local, zero shuffle.",
    tags=("E27",),
)
def part_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.try_element_at(words, F.lit(8)).alias("word8"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size") - 10).alias(
            "price_per_excess"
        ),
        F.try_to_number(
            F.nullif(F.regexp_extract("p_name", r"([0-9]+)", 1), F.lit("")),
            F.lit("999999"),
        )
        .cast("bigint")
        .alias("name_num"),
        F.substring("p_brand", 7, 10).try_cast("bigint").alias("brand_num"),
    )


@register(
    "part_kv_str_to_map",
    oracle="""
    SELECT p_partkey,
           'brand,size,type' AS keys_sorted,
           p_brand AS brand_val,
           CAST(p_size AS BIGINT) AS size_val,
           CAST(3 AS INT) AS n_entries
    FROM part
    """,
    doc="str_to_map (op E26 long tail): parse a delimited k=v string into "
    "map<string,string>; the oracle recomputes the fields from the base "
    "columns, so the round trip build-string -> str_to_map -> element_at "
    "is pinned end-to-end. Row-local codegen, no shuffle.",
    tags=("E26",),
)
def part_kv_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    kv = F.concat_ws(
        ",",
        F.concat(F.lit("brand="), F.col("p_brand")),
        F.concat(F.lit("size="), F.col("p_size").cast("string")),
        F.concat(F.lit("type="), F.col("p_type")),
    )
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    return part.select(
        "p_partkey",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "size").cast("bigint").alias("size_val"),
        F.size(m).alias("n_entries"),
    )


@register(
    "doc_tokens_posexplode",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 40
    )
    SELECT doc_id, CAST(u.pos AS INT) AS pos, toks[u.pos + 1] AS tok,
           CAST(length(toks[u.pos + 1]) AS INT) AS tok_len
    FROM t, UNNEST(range(len(t.toks))) AS u(pos)
    """,
    doc="posexplode (op E25/E36 generator shape): ordinal-preserving token "
    "fan-out, the set-returning analog of the reference's positional row "
    "unpack (ccxt-ohlcv-fetch.py:57-66). Generate node inside codegen; "
    "output is ~tokens-per-doc x rows, so real pipelines bound it with a "
    "pushed-down filter as here.",
    tags=("E25", "E36"),
)
def doc_tokens_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    exploded = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    return exploded.select(
        "doc_id", "pos", "tok", F.length("tok").alias("tok_len")
    )


@register(
    "doc_tokens_posexplode_outer",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 60 THEN string_split(text, ' ') END AS toks
      FROM documents WHERE doc_id < 40
    )
    SELECT doc_id, CAST(u.pos AS INT) AS pos, toks[u.pos + 1] AS tok
    FROM t LEFT JOIN LATERAL
      (SELECT unnest(range(len(t.toks))) AS pos) u ON TRUE
    """,
    doc="posexplode_outer (op E25 generator shape): NULL/empty arrays keep "
    "their parent row with NULL pos/tok — outer-generate semantics, the "
    "row-preserving variant needed when exploding optional nested data.",
    tags=("E25",),
)
def doc_tokens_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = F.when(F.col("n_chars") >= 60, F.split("text", " "))
    return docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    )


@register(
    "acctbal_width_buckets",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 0
                WHEN c_acctbal >= 10000 THEN 6
                ELSE CAST(floor(c_acctbal / (10000.0 / 5)) AS BIGINT) + 1
           END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(c_acctbal) AS lo,
           max(c_acctbal) AS hi
    FROM customer
    GROUP BY 1
    """,
    doc="width_bucket equal-width histogram (op E17 long tail): bucket id "
    "0 below range, n+1 above, else floor((v-lo)/width)+1 — the oracle "
    "reproduces the same float ops so boundary values land identically. "
    "Map-side combine on <=7 buckets; one tiny shuffle.",
    tags=("E17",),
)
def acctbal_width_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy(
            F.width_bucket("c_acctbal", F.lit(0.0), F.lit(10000.0), F.lit(5)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
        )
    )


@register(
    "event_value_histogram",
    oracle=None,  # sketch output depends on merge order -> rows-only check
    doc="histogram_numeric(value, 12) over events (op E17 sketch tier): "
    "Spark's NumericHistogram sketch — mergeable fixed-size bin set, the "
    "same partial/final pattern as approx_count_distinct; bin centroids "
    "are merge-order-dependent, hence no value oracle. Exploded to "
    "(bin_x, bin_y) rows for a stable schema.",
    tags=("E17",),
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output carries the sketch's own invariant audit (bound columns,
    VERDICT r5 item 5): ``mass_ok`` — bin weights must sum to the exact
    row count (NumericHistogram preserves mass); ``range_ok`` — every
    centroid lies inside the exact [min, max] of the data. Both are
    per-row constants, so the committed result proves the sketch's
    contract held on this run."""
    events = load_table(spark, sf_dir, "events")
    exact = events.agg(
        F.count("value").alias("_n"),
        F.min("value").alias("_lo"),
        F.max("value").alias("_hi"),
    )
    hist = events.select(
        F.explode(F.histogram_numeric("value", F.lit(12))).alias("bin")
    ).select(
        F.col("bin.x").cast("double").alias("bin_x"),
        F.col("bin.y").cast("double").alias("bin_y"),
    )
    from pyspark.sql.window import Window as W

    audited = hist.crossJoin(F.broadcast(exact))
    w = W.partitionBy(F.lit(1))
    return audited.select(
        "bin_x",
        "bin_y",
        (F.abs(F.sum("bin_y").over(w) - F.col("_n")) < 1e-6).alias("mass_ok"),
        (
            (F.min("bin_x").over(w) >= F.col("_lo"))
            & (F.max("bin_x").over(w) <= F.col("_hi"))
        ).alias("range_ok"),
    )


@register(
    "part_string_funcs_extended",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, 'Brand#25') AS brand_dist,
           translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
           split_part(p_type, ' ', 2) AS type_mid,
           reverse(p_name) AS name_rev,
           repeat(substr(p_brand, 7, 1), 3) AS digit3,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked
    FROM part
    """,
    doc="Extended string functions (op R14 long tail): levenshtein "
    "(edit-distance — the fuzzy-match primitive text dedup pipelines "
    "block on), translate, split_part, reverse, repeat, global "
    "regexp_replace. Row-local codegen; levenshtein is O(len^2) per "
    "pair, which is why E34 uses it post-blocking, never all-pairs.",
    tags=("R14", "E34"),
)
def part_string_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#25"))
        .cast("bigint").alias("brand_dist"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
        F.reverse("p_name").alias("name_rev"),
        F.repeat(F.substring("p_brand", 7, 1), 3).alias("digit3"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_masked"),
    )


@register(
    "order_datetime_funcs_extended",
    oracle="""
    SELECT o_orderkey,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_2024,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d')
             AS plus3mo
    FROM orders
    """,
    doc="Extended datetime functions (op R15 long tail): last_day, "
    "quarter, dayofweek (Spark is 1-based Sunday, DuckDB 0-based — the "
    "oracle shims +1), weekofyear (ISO), datediff, add_months (both "
    "engines clamp to month end). All UTC, all codegen.",
    tags=("R15",),
)
def order_datetime_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("woy"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias("days_since_2024"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3mo"),
    )


@register(
    "order_interval_arithmetic",
    oracle=f"""
    SELECT o_orderkey,
           {sql_ms("o_orderdate + to_months(CAST(o_orderkey % 3 AS INT)) "
                   "+ to_days(CAST(o_orderkey % 10 AS INT)) + to_hours(12)")}
             AS due_ms,
           {sql_ms("o_orderdate - to_years(1)")} AS year_ago_ms,
           {sql_ms("o_orderdate + to_hours(36) + to_minutes(30)")} AS plus36h_ms
    FROM orders
    """,
    doc="Interval arithmetic (op R15, SURVEY §1.5/§2.8 tail — the "
    "reference's relativedelta calendar math, ccxt-ohlcv-fetch.py:"
    "159-162): make_interval with DATA-DEPENDENT month/day amounts "
    "(calendar intervals clamp to month end in both engines), a "
    "year-month subtraction, and a make_dt_interval fixed-duration "
    "add. All row-local codegen; outputs epoch-ms bigints per the "
    "exactness discipline.",
    tags=("R15",),
)
def order_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    zero = F.lit(0)
    due = ts + F.make_interval(
        zero,
        (F.col("o_orderkey") % 3).cast("int"),
        zero,
        (F.col("o_orderkey") % 10).cast("int"),
        F.lit(12),
        zero,
        F.lit(0).cast("decimal(18,6)"),
    )
    return orders.select(
        "o_orderkey",
        F.unix_millis(due).alias("due_ms"),
        F.unix_millis(ts - F.make_interval(F.lit(1))).alias("year_ago_ms"),
        F.unix_millis(
            ts + F.make_dt_interval(zero, F.lit(36), F.lit(30))
        ).alias("plus36h_ms"),
    )


@register(
    "doc_sentences_locale",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             substr(text, 1, 40) || '? ' || substr(text, 41, 80) || '? '
               || substr(text, 121) AS st
      FROM documents WHERE n_chars >= 200
    ),
    s AS (
      SELECT doc_id,
             list_transform(
               string_split(st, '? '),
               seg -> list_filter(string_split(trim(seg), ' '), w -> w != '')
             ) AS sents
      FROM t
    )
    SELECT doc_id,
           CAST(len(sents) AS INT) AS n_sentences,
           CAST(len(sents[1]) AS INT) AS n_first,
           CAST(len(flatten(sents)) AS INT) AS n_words,
           sents[1][1] AS first_word,
           sents[-1][-1] AS last_word
    FROM s
    """,
    doc="Locale-aware sentence segmentation (op R14/E36 tail): "
    "sentences(str, 'en', 'US') — java.text.BreakIterator under the "
    "hood — over deterministic synthesized sentence boundaries (the "
    "fixture text is punctuation-free, so '? ' boundaries are injected "
    "at fixed offsets both engines replicate; '.' is NOT used because "
    "BreakIterator only breaks on it before an uppercase start). Checks the nested "
    "array<array<string>> shape end to end: per-sentence word lists, "
    "flatten, negative indexing.",
    tags=("R14", "E36"),
)
def doc_sentences_locale(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 200)
    st = F.concat(
        F.substring("text", 1, 40),
        F.lit("? "),
        F.substring("text", 41, 80),
        F.lit("? "),
        F.expr("substring(text, 121)"),
    )
    s = F.sentences(st, F.lit("en"), F.lit("US"))
    return docs.select(
        "doc_id",
        F.size(s).alias("n_sentences"),
        F.size(F.element_at(s, 1)).alias("n_first"),
        F.size(F.flatten(s)).alias("n_words"),
        F.element_at(F.element_at(s, 1), 1).alias("first_word"),
        F.element_at(F.element_at(s, -1), -1).alias("last_word"),
    )


@register(
    "lineitem_conditional_aggs",
    oracle="""
    SELECT l_linestatus,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           CAST(count(*) FILTER (l_discount = 0.0) AS BIGINT) AS n_nodisc,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                FILTER (l_returnflag = 'R') AS DOUBLE) AS returned_value,
           max(l_extendedprice) FILTER (l_quantity > 40) AS max_bulk_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="Conditional aggregation (op E16/E17 long tail): count_if and "
    "FILTER-clause aggregates — the predicate moves inside the "
    "aggregate buffer (one pass, map-side combine) instead of a "
    "pre-filter that would need one scan per condition.",
    tags=("E16", "E17"),
)
def lineitem_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.plans.registry import dec

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.count(F.when(F.col("l_discount") == 0.0, 1)).alias("n_nodisc"),
        F.sum(F.when(F.col("l_returnflag") == "R", dec("l_extendedprice")))
        .cast("double")
        .alias("returned_value"),
        F.max(F.when(F.col("l_quantity") > 40, F.col("l_extendedprice"))).alias(
            "max_bulk_price"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "daily_user_sketch_rollup",
    oracle=None,  # Datasketches HLL binary format is Spark-specific; the
    # re-aggregation law + accuracy are pinned in tests/test_sketches.py
    doc="Mergeable-sketch distinct rollup (op E14 at 100 TB): "
    "hll_sketch_agg(user_id) per day, hll_union_agg to the month — the "
    "two-level pattern that makes distinct counts *re-aggregatable*: "
    "daily sketches are tiny (<=KB), persistable next to the rollup "
    "(operators/rollup.py), and any coarser window is a union of "
    "sketches instead of a recount over raw events. approx_count_"
    "distinct gives one number; sketches give an algebra.",
    tags=("E14",),
)
def daily_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("sketch"),
            F.count_distinct("user_id").alias("exact_daily"),
        )
    )
    return (
        daily.groupBy(F.date_trunc("month", "day").alias("month"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_monthly"),
            F.sum("exact_daily").alias("sum_daily_exact"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            F.unix_millis(F.col("month").cast("timestamp")).alias("month_ms"),
            "est_monthly",
            "sum_daily_exact",
            "n_days",
        )
    )


@register(
    "event_props_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS BIGINT) AS missing_val,
           'OBJECT<k: BIGINT>' AS var_schema,
           CAST(json_extract(props, '$.k') AS BIGINT) * 10 AS k_x10
    FROM events
    """,
    doc="VARIANT semi-structured access (Spark 4, op E26 scale path): "
    "parse_json once into the binary variant encoding, then "
    "variant_get path access — unlike from_json, no up-front schema and "
    "no full re-parse per path; shredded storage makes this the "
    "100 TB-friendly way to query heterogeneous JSON. try_variant_get "
    "on an absent path yields NULL (not an error); schema_of_variant "
    "reports the per-row inferred shape.",
    tags=("E26",),
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = events.select("event_id", F.parse_json("props").alias("_v"))
    return v.select(
        "event_id",
        F.variant_get("_v", "$.k", "bigint").alias("k_val"),
        F.try_variant_get("_v", "$.missing", "bigint").alias("missing_val"),
        F.schema_of_variant("_v").alias("var_schema"),
        (F.variant_get("_v", "$.k", "bigint") * 10).alias("k_x10"),
    )


@register(
    "event_props_map_hofs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           CAST(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                     THEN 1 ELSE 0 END AS INT) AS n_high,
           'k_x' AS renamed_keys,
           CAST(json_extract(props, '$.k') AS BIGINT)
             + CAST(length(event_type) AS BIGINT) AS k_plus_typelen
    FROM events
    """,
    doc="Map higher-order functions (op E26 long tail): transform_values, "
    "map_filter, transform_keys, map_zip_with over a parsed "
    "map<string,bigint>. The oracle recomputes key-wise from the JSON "
    "(DuckDB's MAP is a different type family). All row-local codegen.",
    tags=("E26",),
)
def event_props_map_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("_m"),
    )
    other = F.create_map(F.lit("k"), F.length("event_type").cast("bigint"))
    return base.select(
        "event_id",
        F.element_at(
            F.transform_values("_m", lambda _k, v: v * 2), "k"
        ).alias("k_doubled"),
        F.size(F.map_filter("_m", lambda _k, v: v > 50)).alias("n_high"),
        F.array_join(
            F.array_sort(F.map_keys(F.transform_keys("_m", lambda k, _v: F.concat(k, F.lit("_x"))))),
            ",",
        ).alias("renamed_keys"),
        F.element_at(
            F.map_zip_with(
                "_m",
                other,
                lambda _k, a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
            ),
            "k",
        ).alias("k_plus_typelen"),
    )


@register(
    "doc_token_array_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             list_transform(string_split(text, ' '), x -> CAST(length(x) AS INT))
               AS lens
      FROM documents
    )
    SELECT doc_id,
           CAST(list_position(lens, 5) AS INT) AS first_len5,
           CAST(len(list_filter(lens, x -> x > 4)) AS INT) AS n_long,
           list_has_any(lens, [5, 7]) AS has_5_or_7,
           CAST(len(list_filter(lens, x -> x != 3)) AS INT) AS n_not3,
           CAST(list_reduce(range(1, len(toks) + 1), (a, b) -> a + b)
                AS BIGINT) AS seq_sum,
           CAST(len(flatten([lens, lens])) AS INT) AS flat2_n,
           array_to_string(list_transform(range(3), x -> toks[1]), '|')
             AS head_x3
    FROM t
    """,
    doc="Array-op long tail (op E25): array_position, filter, "
    "arrays_overlap, array_remove-by-predicate, sequence + aggregate "
    "(1..n sum), flatten, array_repeat. Integer-array outputs only — "
    "float arrays are avoided in hashed outputs because float->string "
    "formatting differs across engines.",
    tags=("E25",),
)
def doc_token_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.transform(F.split("text", " "), lambda x: F.length(x)).alias("lens"),
    )
    return base.select(
        "doc_id",
        F.array_position("lens", 5).cast("int").alias("first_len5"),
        F.size(F.filter("lens", lambda x: x > 4)).alias("n_long"),
        F.arrays_overlap("lens", F.array(F.lit(5), F.lit(7))).alias("has_5_or_7"),
        F.size(F.array_remove("lens", 3)).alias("n_not3"),
        F.aggregate(
            F.sequence(F.lit(1), F.size("toks")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("seq_sum"),
        F.size(F.flatten(F.array(F.col("lens"), F.col("lens")))).alias("flat2_n"),
        F.array_join(
            F.array_repeat(F.element_at("toks", 1), 3), "|"
        ).alias("head_x3"),
    )


@register(
    "order_month_spine_recursive",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1997-01-01 00:00:00'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '1997-12-01 00:00:00'
    )
    SELECT strftime(months.m, '%Y-%m') AS month,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           coalesce(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
                         AS DOUBLE), 0.0) AS month_value
    FROM months LEFT JOIN orders o
      ON date_trunc('month', o.o_orderdate) = months.m
    GROUP BY months.m
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): generate the month spine "
    "of the data's own date range, then left-join per-month order "
    "aggregates — empty months survive with zero counts (the date-spine "
    "gap-fill shape; complements the lag/LOCF gapfill in "
    "plans/timeseries.py). Each recursive step is a scheduled job, so "
    "depth is bounded to one year here; an unbounded spine belongs to "
    "sequence()+explode (see event_traffic_gapfill) — WITH RECURSIVE "
    "earns its cost only when each step genuinely depends on the "
    "previous one (iterative closure), not for plain series.",
    tags=("E15", "E19"),
)
def order_month_spine_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rc_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1997-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '1997-12-01 00:00:00'
        )
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               count(o.o_orderkey) AS n_orders,
               coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6)))
                             AS DOUBLE), 0.0D) AS month_value
        FROM months LEFT JOIN _rc_orders o
          ON date_trunc('MONTH', o.o_orderdate) = months.m
        GROUP BY months.m
        """
    )


@register(
    "orders_page3",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_orderkey
    LIMIT 100 OFFSET 200
    """,
    doc="Keyset-free pagination (op E22 long tail): ORDER BY unique key "
    "+ LIMIT/OFFSET. Spark plans a global TakeOrderedAndProject of "
    "offset+limit rows, then drops the prefix — fine for UI pages, "
    "O(offset) at depth; deep pagination at 100 TB should switch to a "
    "keyset predicate (WHERE key > last_seen ORDER BY key LIMIT n), "
    "which is the indexed-scan shape the reference's resume query uses "
    "(ccxt-ohlcv-fetch.py:87).",
    tags=("E22",),
)
def orders_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(200)
        .limit(100)
    )


@register(
    "part_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           regexp_extract(p_type, '[A-Z]+') AS first_caps,
           (p_brand SIMILAR TO 'Brand#[0-9]+') AS brand_like,
           CAST(len(regexp_extract_all(p_type, '[A-Z]+')) AS INT) AS n_capruns
    FROM part
    """,
    doc="Regex function long tail (op R14): regexp_count (match "
    "cardinality), regexp_substr (first match or NULL), rlike predicate "
    "— generalizations of the reference's timeframe-grammar match "
    "(ccxt-ohlcv-fetch.py:142-143). One compiled pattern per expression "
    "per task, row-local.",
    tags=("R14",),
)
def part_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("n_vowels"),
        F.regexp_substr("p_type", F.lit("[A-Z]+")).alias("first_caps"),
        F.col("p_brand").rlike("^Brand#[0-9]+$").alias("brand_like"),
        F.regexp_count("p_type", F.lit("[A-Z]+")).alias("n_capruns"),
    )


@register(
    "doc_content_hashes",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha_hex,
           substr(sha256(text), 1, 16) AS short_id,
           base64(encode(substr(text, 1, 8))) AS head_b64,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex
    FROM documents
    """,
    doc="Content-addressing functions (op E33 primitive): md5 / sha2 / "
    "base64 / hex — the stable content ids that exact dedup, caching, "
    "and provenance tracking key on (operators/dedup.py groups on the "
    "md5-derived key). Cross-engine byte-identical digests, verified by "
    "the hash gate itself.",
    tags=("E33", "R14"),
)
def doc_content_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sha = F.sha2("text", 256)
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        sha.alias("sha_hex"),
        F.substring(sha, 1, 16).alias("short_id"),
        F.base64(F.substring("text", 1, 8).cast("binary")).alias("head_b64"),
        F.lower(F.hex(F.substring("text", 1, 4).cast("binary"))).alias("head_hex"),
    )


@register(
    "lineitem_minmax_scaled",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
           CASE WHEN mx > mn THEN (l_extendedprice - mn) / (mx - mn)
                ELSE 0.0 END AS price_scaled
    FROM (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
             min(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mn,
             max(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mx
      FROM lineitem
    )
    """,
    doc="Grouped-map UDF tier (op §2.10, applyInPandas): per-group "
    "min-max normalization where the whole group crosses to pandas as "
    "one Arrow frame. The oracle is the pure window-function "
    "formulation — min/max are exact picks and the scale is one IEEE "
    "sub+div, so the Python kernel hashes identically to SQL (the rare "
    "float kernel where that holds). The window form is also the "
    "100 TB path; the UDF form is for when the per-group logic outgrows "
    "SQL (model fits, iterative passes).",
    tags=("E17",),
)
def lineitem_minmax_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.grouped import minmax_scale_prices

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return minmax_scale_prices(li)


@register(
    "doc_tokens_udtf",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 25
    )
    SELECT doc_id, CAST(u.pos AS INT) AS pos, toks[u.pos + 1] AS token,
           CAST(length(toks[u.pos + 1]) AS INT) AS token_len
    FROM t, UNNEST(range(len(t.toks))) AS u(pos)
    """,
    doc="Python UDTF tier (op §2.10, Spark 3.5+ @udtf): a row-to-rows "
    "table function callable from SQL via LATERAL — here a tokenizer "
    "emitting (pos, token, len). Covers the API tier; the plan-shape "
    "twin doc_tokens_posexplode stays on the built-in generator, which "
    "is the hot-path choice (no Python boundary).",
    tags=("E25", "E36"),
)
def doc_tokens_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.grouped import register_token_udtf

    register_token_udtf(spark)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 25
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.token_len
        FROM _udtf_docs d, LATERAL token_stats(d.text) t
        """
    )


@register(
    "price_mad_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(mad(l_extendedprice) AS DOUBLE) AS price_mad,
           CAST(mad(l_quantity) AS DOUBLE) AS qty_mad
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Grouped-aggregate pandas UDF (op §2.10 grouped-agg tier): "
    "median absolute deviation per group, numpy kernel against DuckDB's "
    "native mad() — order-statistic picks and midpoints only, so the "
    "Python path hash-matches SQL exactly. Whole group buffers per agg "
    "call (like exact percentiles): fine for low-cardinality keys, use "
    "approx sketches for high-cardinality at 100 TB.",
    tags=("E17",),
)
def price_mad_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.grouped import mad_udaf

    mad = mad_udaf()
    li = load_table(spark, sf_dir, "lineitem")
    # note: grouped-agg pandas UDFs cannot mix with JVM aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT) — keep the agg pure-pandas
    return li.groupBy("l_returnflag").agg(
        mad("l_extendedprice").alias("price_mad"),
        mad("l_quantity").alias("qty_mad"),
    )


@register(
    "rolling_price_mad",
    oracle="""
    SELECT o_orderkey,
           CAST(mad(o_totalprice) OVER (
             PARTITION BY o_orderstatus
             ORDER BY o_orderkey
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS mad20
    FROM orders
    WHERE o_orderkey < 30000
    """,
    doc="Rolling 20-row median absolute deviation of order value — a "
    "robust volatility band no built-in expression covers (op §2.10 x "
    "E20). The bounded frame materializes in the JVM window "
    "(collect_list over ROWS 19 PRECEDING) and ONE vectorized Arrow "
    "batch crosses to Python per task — r12 optimization: the earlier "
    "grouped-agg-UDF-over-window form paid a per-row kernel call in "
    "the worker (2.13 s -> ~0.5 s at sf0.1, bit-identical since the "
    "numpy order-statistic picks are unchanged). At 100 TB bound the "
    "frame; the oracle is DuckDB's native windowed mad() — exact-pick "
    "arithmetic keeps them bit-identical. Ordered by the UNIQUE "
    "o_orderkey: a tied window order would make frames "
    "engine-dependent (lineitem's (orderkey,linenumber) is non-unique "
    "in this fixture — found the hard way).",
    tags=("E20", "E17"),
)
def rolling_price_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ccxt_ohlcv_fetcher_spark.operators.grouped import mad_arrays_udf

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 30000)
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rowsBetween(-19, 0)
    )
    # Frames materialize in the JVM window (collect_list over the same
    # ROWS frame) and ONE vectorized Arrow batch crosses to Python,
    # instead of the grouped-agg-UDF-over-window shape whose worker
    # slices and calls the kernel once per row (guide §4: batch the
    # boundary). Median arithmetic is unchanged (same numpy order-
    # statistic picks on the same frame values), so results are
    # bit-identical — r12 measured 2.13 -> ~0.5 s at sf0.1.
    frames = orders.select(
        "o_orderkey", F.collect_list("o_totalprice").over(w).alias("_frame")
    )
    return frames.select(
        "o_orderkey", mad_arrays_udf()(F.col("_frame")).alias("mad20")
    )


@register(
    "price_approx_percentiles",
    oracle=None,  # sketch output is merge-order-dependent (t-digest-like
    # GK summaries); accuracy vs the exact path is pinned in
    # tests/test_sketches.py
    doc="approx_percentile (op E17 sketch tier): quantile summaries with "
    "bounded error (accuracy parameter = 1/eps), partial-aggregable — "
    "the high-cardinality-key counterpart to the exact percentile "
    "queries (price_percentiles), whose per-group full sort does not "
    "scale past low-cardinality keys.",
    tags=("E17",),
)
def price_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ap = F.percentile_approx(
        "l_extendedprice", F.lit([0.5, 0.9, 0.99]), F.lit(10_000)
    )
    return li.groupBy("l_returnflag").agg(
        ap[0].alias("p50_approx"),
        ap[1].alias("p90_approx"),
        ap[2].alias("p99_approx"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "quantity_mode_median",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, count(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    modes AS (
      SELECT l_returnflag, l_quantity AS mode_qty
      FROM (
        SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY c DESC, l_quantity ASC) AS rn
        FROM counts
      ) WHERE rn = 1
    )
    SELECT m.l_returnflag,
           CAST(m.mode_qty AS DOUBLE) AS mode_qty,
           CAST(median(li.l_quantity) AS DOUBLE) AS median_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem li JOIN modes m USING (l_returnflag)
    GROUP BY 1, 2
    """,
    doc="Deterministic mode + interpolated median per group (op E17 "
    "breadth): Spark's mode() breaks frequency ties arbitrarily, so "
    "the mode here is derived deterministically — count per (group, "
    "value), rank by (count DESC, value ASC), keep rank 1 — the same "
    "tie rule both engines can express; median() is the continuous "
    "50th percentile (Spark median == DuckDB quantile_cont). One "
    "count aggregation + one window over group cardinality rows + the "
    "group's median pass; everything partial-aggregates before the "
    "shuffle.",
    tags=("E17", "E13", "E18"),
)
def quantity_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("c").desc(), F.col("l_quantity").asc()
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag", F.col("l_quantity").cast("double").alias("mode_qty")
        )
    )
    med = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").cast("double").alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    return med.join(F.broadcast(modes), "l_returnflag").select(
        "l_returnflag", "mode_qty", "median_qty", "n"
    )


@register(
    "order_equidepth_hist",
    oracle="""
    WITH t AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM t GROUP BY bucket
    """,
    doc="Equi-DEPTH histogram via DISTRIBUTED exact ntile (op E17/E18 "
    "composition): 8 buckets of (near-)equal row count over the "
    "order-value distribution, the complement of acctbal_width_"
    "buckets' equal-WIDTH bins and the shape CBO column statistics "
    "use. This query runs on the RAW orders table, so a window ntile "
    "(single-partition global sort — the whole fact table through one "
    "task) is the wrong plan at any multiple of this scale; instead "
    "the bucket derives arithmetically from functions/rank.py's "
    "SIZE-GATED rank (adaptive_rank_source, round-8 verdict item 3): "
    "one metadata-cheap count picks a one-task window below 4M rows "
    "(where the two-pass shape's fixed checkpoint cost loses) and the "
    "two-pass range-partitioned global rank above (no Exchange "
    "SinglePartition — branch equality pinned in tests/test_rank.py). "
    "Rank order carries the unique-key tie-break, so assignment is "
    "total and bit-identical to SQL NTILE on both branches.",
    tags=("E17", "E18"),
)
def order_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.functions.rank import (
        adaptive_rank_source,
        ntile_from_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    ranked, total = adaptive_rank_source(
        orders.select("o_totalprice", "o_orderkey"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        rank_name="_rk",
    )
    return (
        ranked.select(
            "o_totalprice",
            ntile_from_rank("_rk", total, 8).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "event_key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    r AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt, user_id) AS rk,
             count(*) OVER () AS k,
             sum(cnt) OVER () AS total
      FROM c
    )
    SELECT CAST(max(k) AS BIGINT) AS n_keys,
           CAST(max(total) AS BIGINT) AS n_rows,
           max(cnt) AS max_cnt,
           CAST(max(cnt) AS DOUBLE) / (CAST(max(total) AS DOUBLE)
             / CAST(max(k) AS DOUBLE)) AS skew_factor,
           CAST(SUM(CAST((2 * rk - k - 1) AS BIGINT) * cnt) AS DOUBLE)
             / (CAST(max(k) AS DOUBLE) * CAST(max(total) AS DOUBLE))
             AS gini
    FROM r
    """,
    doc="Partition-key skew profile (op E17/E18; the diagnostic behind "
    "every salting/AQE-skew-join decision): per-key counts, then the "
    "hot-key skew factor (max over mean) and the exact Gini "
    "coefficient of the key-size distribution via the rank identity "
    "G = sum((2r-k-1)*c_r) / (k*total) — integer arithmetic until the "
    "two final divisions, so cross-engine exact. The rank order "
    "carries the key tie-break. The profile runs on aggregated counts "
    "routed through functions/rank.py's adaptive_rank: a one-task "
    "window while the key table fits (it usually does — this is a "
    "per-key aggregate), flipping to the two-pass range-partitioned "
    "rank past 64k keys so a hot-key table at 100 TB never funnels "
    "through one task. k rides back from the rank's O(P) driver sync "
    "as a literal, so the over()-window global count disappears too.",
    tags=("E17", "E18"),
)
def event_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.functions.rank import adaptive_rank

    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    r, k = adaptive_rank(
        c, [F.col("cnt").asc(), F.col("user_id").asc()], rank_name="rk"
    )
    agg = r.agg(
        F.sum("cnt").alias("_total"),
        F.max("cnt").alias("_max"),
        F.sum(
            (F.lit(2) * F.col("rk") - F.lit(k) - F.lit(1)).cast("bigint")
            * F.col("cnt")
        ).alias("_g"),
    )
    return agg.select(
        F.lit(k).cast("long").alias("n_keys"),
        F.col("_total").cast("long").alias("n_rows"),
        F.col("_max").alias("max_cnt"),
        (
            F.col("_max").cast("double")
            / (F.col("_total").cast("double") / F.lit(k).cast("double"))
        ).alias("skew_factor"),
        (
            F.col("_g").cast("double")
            / (F.lit(k).cast("double") * F.col("_total").cast("double"))
        ).alias("gini"),
    )


@register(
    "lineitem_exact_quantiles",
    oracle="""
    WITH r AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS rk,
             count(*) OVER () AS n
      FROM lineitem
    ),
    p AS (
      SELECT q_bp,
             (q_bp * (SELECT CAST(max(n) AS BIGINT) FROM r) + 9999) // 10000
               AS pos
      FROM (VALUES (2500), (5000), (7500), (9000), (9900)) AS t(q_bp)
    )
    SELECT CAST(p.q_bp AS BIGINT) AS q_bp, r.v AS value
    FROM r JOIN p ON r.rk = p.pos
    """,
    doc="EXACT distributed quantiles over the raw lineitem table (op "
    "E17 exact tier; the showcase for functions/rank.py on raw data): "
    "the value at rank ceil(q*n) under the total order (price, "
    "orderkey, linenumber) for q in {25, 50, 75, 90, 99}%%. The rank "
    "comes from the SIZE-GATED adaptive_rank_source: a one-task window "
    "below 4M rows, the two-pass range-partitioned global_rank above "
    "(NO single-partition sort), so unlike a window-ntile percentile "
    "this stays exact at any corpus size (the approx complement is "
    "price_approx_percentiles). Quantile positions use basis-point "
    "INTEGER arithmetic ((q_bp*n + 9999) // 10000) so both engines "
    "pick the identical rank with zero float rounding.",
    tags=("E17", "E22"),
)
def lineitem_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.functions.rank import adaptive_rank_source

    li = load_table(spark, sf_dir, "lineitem")
    ranked, n = adaptive_rank_source(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        [
            F.col("l_extendedprice").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        rank_name="_rk",
    )
    pos = [(bp, (bp * n + 9999) // 10000) for bp in (2500, 5000, 7500, 9000, 9900)]
    pos_df = spark.createDataFrame(pos, "q_bp long, _pos long")
    return (
        ranked.join(F.broadcast(pos_df), ranked["_rk"] == pos_df["_pos"])
        .select("q_bp", F.col("l_extendedprice").alias("value"))
    )


@register(
    "order_cumulative_revenue",
    oracle="""
    WITH c AS (
      SELECT o_orderdate,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM orders
    )
    SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
           CAST(date_part('month', o_orderdate) AS INT) AS mo,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(cum) AS DOUBLE) AS month_end_cum
    FROM c GROUP BY 1, 2
    """,
    doc="Month-end cumulative revenue from a RAW-table running sum (op "
    "E21 at scale; the global_cumsum showcase): the decimal-exact "
    "running total over every order in (date, key) order — size-gated "
    "(adaptive_cumsum_source): one-task window below 4M rows, the "
    "two-pass range-partitioned prefix sum above, so the raw fact "
    "table never funnels through one task at scale — then collapsed "
    "to the month-end value (cumsum of positive values is monotone, "
    "so max per month IS the month's closing total). Decimal prefix "
    "offsets accumulate exactly (Python decimal), so both engines "
    "agree to the last bit of the final double cast.",
    tags=("E21", "E13", "E17"),
)
def order_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.functions.rank import (
        adaptive_cumsum_source,
    )
    from ccxt_ohlcv_fetcher_spark.plans.registry import dec

    orders = load_table(spark, sf_dir, "orders")
    cum = adaptive_cumsum_source(
        orders.select("o_orderdate", "o_orderkey", "o_totalprice"),
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        dec("o_totalprice"),
        sum_name="_cum",
    )
    return cum.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("_cum").cast("double").alias("month_end_cum"),
    )


@register(
    "lineitem_weighted_median",
    oracle="""
    WITH r AS (
      SELECT l_extendedprice AS v,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING
             ) AS cumw,
             SUM(CAST(l_quantity AS BIGINT)) OVER () AS w
      FROM lineitem
    )
    SELECT v AS weighted_median,
           CAST(cumw AS BIGINT) AS cum_weight,
           CAST(w AS BIGINT) AS total_weight
    FROM r WHERE 2 * cumw >= w
    ORDER BY cumw LIMIT 1
    """,
    doc="EXACT quantity-weighted median of the price distribution over "
    "the raw lineitem table (op E17/E21 composition; the inventory-"
    "weighted price point): the first value, in total (price, "
    "orderkey, linenumber) order, whose running quantity weight "
    "reaches half the total — computed with the size-gated "
    "adaptive_cumsum_source (one-task window below 4M rows, two-pass "
    "distributed prefix sum above; integer weights, so the running "
    "sums are exact int64 in both engines) and a TakeOrdered(1) for "
    "the crossing row. The half-total test is the division-free "
    "2*cumw >= W form, so no float rounding exists anywhere. Total "
    "weight is ONE 1-row driver scalar (max of the materialized "
    "running sum — bounds/moments class); no single-partition stage "
    "on the at-scale branch.",
    tags=("E17", "E21", "E22"),
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.functions.rank import (
        adaptive_cumsum_source,
    )

    li = load_table(spark, sf_dir, "lineitem")
    cum = adaptive_cumsum_source(
        li.select(
            "l_extendedprice", "l_orderkey", "l_linenumber", "l_quantity"
        ),
        [
            F.col("l_extendedprice").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        F.col("l_quantity").cast("bigint"),
        sum_name="_cumw",
    )
    # total weight == max of the running sum, but computing it that way
    # executes the whole cumsum pipeline once for the scalar and again
    # for the returned plan (guide §1.2: don't compute what you throw
    # away). sum(l_quantity) over the raw column-pruned scan is the
    # same exact int64 for a fraction of the work (r12: 2.09 -> ~1.1 s).
    w = li.agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("_w")
    ).collect()[0]["_w"]
    return (
        cum.filter(F.lit(2) * F.col("_cumw") >= F.lit(w))
        .orderBy("_cumw")
        .limit(1)
        .select(
            F.col("l_extendedprice").alias("weighted_median"),
            F.col("_cumw").cast("long").alias("cum_weight"),
            F.lit(w).cast("long").alias("total_weight"),
        )
    )


# --- multi-feature OLS via Cramer's rule (shared expression text) ---------
# One Python constant per determinant so the Spark builder and the DuckDB
# oracle evaluate the IDENTICAL IEEE expression tree: inputs are exact
# doubles (integer-unit sums < 2^53), double arithmetic has no engine
# freedom left, and round(..., 6) absorbs nothing but the last guard bit.
_OLS_DET = (
    "(n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd) + sd*(sq*sqd - sqq*sd))"
)
_OLS_B0 = (
    "(sy*(sqq*sdd - sqd*sqd) - sq*(sqy*sdd - sqd*sdy) + sd*(sqy*sqd - sqq*sdy))"
)
_OLS_B1 = (
    "(n*(sqy*sdd - sqd*sdy) - sy*(sq*sdd - sqd*sd) + sd*(sq*sdy - sqy*sd))"
)
_OLS_B2 = (
    "(n*(sqq*sdy - sqy*sqd) - sq*(sq*sdy - sqy*sd) + sy*(sq*sqd - sqq*sd))"
)


@register(
    "lineitem_ols_price_model",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sq,
             CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS sd,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sqq,
             CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)
                    * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS sdd,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                    * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS sqd,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                    * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
               AS sqy,
             CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)
                    * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
               AS sdy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           round({_OLS_B0} / {_OLS_DET} / 100, 6) AS icept_usd,
           round({_OLS_B1} / {_OLS_DET} / 100, 6) AS beta_qty_usd,
           round({_OLS_B2} / {_OLS_DET} / 100, 6) AS beta_disc_usd
    FROM s
    """,
    doc="Multi-feature OLS fit as ONE aggregation pass (op E17 at its "
    "distributed-ML shape): per return flag, extendedprice regressed on "
    "(1, quantity, discount) by solving the 3x3 normal equations with "
    "Cramer's rule. The nine sufficient statistics are partial-aggregable "
    "integer-unit sums (cents / discount-percent as BIGINT, every sum "
    "< 2^53 through sf1 so the DOUBLE cast is exact), and the solve is a "
    "post-aggregation projection over 3 rows — the whole fit costs one "
    "map-side-combinable shuffle regardless of table size; no collect, "
    "no iteration, no UDF. Verified against numpy lstsq to 6 decimals. "
    "Beyond sf1 the sqy sum approaches 2^53: switch that one statistic "
    "to DECIMAL(38,0) and re-derive the bound before trusting the cast.",
    tags=("E17",),
)
def lineitem_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = "CAST(l_quantity AS BIGINT)"
    d = "CAST(ROUND(l_discount*100) AS BIGINT)"
    y = "CAST(ROUND(l_extendedprice*100) AS BIGINT)"
    s = li.groupBy("l_returnflag").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr(f"CAST(SUM({q}) AS DOUBLE)").alias("sq"),
        F.expr(f"CAST(SUM({d}) AS DOUBLE)").alias("sd"),
        F.expr(f"CAST(SUM({y}) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM({q}*{q}) AS DOUBLE)").alias("sqq"),
        F.expr(f"CAST(SUM({d}*{d}) AS DOUBLE)").alias("sdd"),
        F.expr(f"CAST(SUM({q}*{d}) AS DOUBLE)").alias("sqd"),
        F.expr(f"CAST(SUM({q}*{y}) AS DOUBLE)").alias("sqy"),
        F.expr(f"CAST(SUM({d}*{y}) AS DOUBLE)").alias("sdy"),
    )
    return s.select(
        "l_returnflag",
        F.expr("CAST(n AS BIGINT)").alias("n_rows"),
        F.expr(f"round({_OLS_B0} / {_OLS_DET} / 100, 6)").alias("icept_usd"),
        F.expr(f"round({_OLS_B1} / {_OLS_DET} / 100, 6)").alias(
            "beta_qty_usd"
        ),
        F.expr(f"round({_OLS_B2} / {_OLS_DET} / 100, 6)").alias(
            "beta_disc_usd"
        ),
    )


@register(
    "customer_order_counts_poisson",
    oracle=None,  # iterative Fisher scoring — not SQL-expressible; the
    # coefficients are pinned against an independent numpy IRLS on the
    # identical feature projection (tests/test_mlfit.py) at 2 AND 3
    # features, and DECIMAL(28,14) sums make them bit-deterministic
    doc="Distributed POISSON REGRESSION (GLM log link) via IRLS "
    "aggregation — the count-model member of the in-engine ML family "
    "(OLS one-pass, binomial/probit IRLS in operators/mlfit.py): "
    "per-customer order count (0 for the never-ordered third, via "
    "left-join + coalesce) modeled on account balance and BUILDING "
    "segment membership. Each Newton step is ONE aggregation shipping "
    "the mu-weighted (k+1)^2 normal-equation sums per partition plus a "
    "driver numpy solve; no collect of data, no UDF — the same shape "
    "at 100 TB. The working response is clamped at |z|<=20 so a "
    "divergent early step cannot overflow the decimal sums.",
    tags=("E17",),
)
def customer_order_counts_poisson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.mlfit import fit_glm

    cust = load_table(spark, sf_dir, "customer")
    cnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    feats = cust.join(
        cnt, cust["c_custkey"] == cnt["o_custkey"], "left"
    ).select(
        F.coalesce("n_orders", F.lit(0)).cast("double").alias("y"),
        (F.col("c_acctbal") / 1000.0).alias("x1"),
        (F.col("c_mktsegment") == "BUILDING").cast("double").alias("x2"),
    )
    fit = fit_glm(feats, "y", ["x1", "x2"], family="poisson")
    return spark.createDataFrame(
        [
            (
                int(fit["n"]),
                int(fit["n_iter"]),
                bool(fit["converged"]),
                round(float(fit["beta"][0]), 10),
                round(float(fit["beta"][1]), 10),
                round(float(fit["beta"][2]), 10),
            )
        ],
        "n_customers bigint, n_iter int, converged boolean,"
        " beta_icept double, beta_acctbal double, beta_building double",
    )
