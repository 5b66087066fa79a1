"""Aggregation breadth (SURVEY.md §2.4, ops E13-E17) + set ops (§2.7,
E23-E24) + sort/limit (§2.6, E22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.plans.registry import (
    davg,
    dec,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


@register(
    "acctbal_rollup",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           grouping(r.r_name) AS g_region, grouping(n.n_name) AS g_nation,
           {sql_dsum("c.c_acctbal")} AS total_bal,
           count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    doc="Hierarchical rollup (op E15) over the region->nation hierarchy — "
    "the partition hierarchy pattern of the reference's directory layout "
    "(gen_db_name, ccxt-ohlcv-fetch.py:134-138). grouping() flags "
    "disambiguate subtotal rows from real NULL keys.",
    tags=("E15", "E5", "E6"),
)
def acctbal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "c_acctbal",
        )
    )
    return joined.rollup("region", "nation").agg(
        F.grouping("region").cast("bigint").alias("g_region"),
        F.grouping("nation").cast("bigint").alias("g_nation"),
        dsum("c_acctbal").alias("total_bal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "lineitem_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
           {sql_dsum("l_quantity")} AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="Cube (op E15): all grouping-set combinations in one pass "
    "(Spark expands to a single Expand + one shuffle).",
    tags=("E15",),
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen (r12): the cube's Expand multiplies the single-split scan's
    # rows 4x on one core; a hash-widened scan runs it cluster-wide
    # (1.38 -> 0.57 s solo at sf0.1)
    li = load_table(spark, sf_dir, "lineitem", widen=True)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "orders_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority,
           {sql_dsum("o_totalprice")} AS total_price,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (op E15, the general form rollup/cube "
    "specialize): two independent one-dimension summaries + grand total "
    "in ONE scan + one shuffle (Spark plans a single Expand), vs three "
    "separate aggregations re-reading the fact table. Expressed through "
    "the SQL entry point — the engine's full surface is reachable via "
    "spark.sql as well as the DataFrame API.",
    tags=("E15", "E13"),
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_price,
               count(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "big_spender_nations",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum("o.o_totalprice")} AS total_price,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    HAVING count(*) > 20
    """,
    doc="HAVING (op E16): post-aggregation filter — in Spark just a "
    "filter over the agg, folded by Catalyst into the same stage.",
    tags=("E16", "E13"),
)
def big_spender_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum("o_totalprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") > 20)
    )


@register(
    "daily_distinct_users",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
    doc="Exact count-distinct (op E14): two-phase distinct aggregation "
    "(Spark expands + partial-aggregates per key before the shuffle).",
    tags=("E14",),
)
def daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "approx_distinct_parts",
    oracle=None,  # HLL sketches differ across engines -> rows-only check;
    # exactness is covered by daily_distinct_users (op E14 exact path)
    doc="approx_count_distinct / HLL++ (op E14 approx path): the 100 TB "
    "path for distinct cardinality — no shuffle of distinct values, "
    "mergeable sketches. Cross-checked against exact counts in tests.",
    tags=("E14",),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "price_stats_by_brand",
    oracle="""
    SELECT p_brand,
           count(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))
                         * CAST(p_retailprice AS DECIMAL(18,6)))
                     AS DECIMAL(38,6)) AS DOUBLE) AS sum_sq,
           min(p_retailprice) AS min_price,
           max(p_retailprice) AS max_price
    FROM part
    GROUP BY 1
    """,
    doc="Statistical aggregates (op E17) via exact decimal moments: "
    "sum and sum-of-squares are exact (decimal), so variance/stddev "
    "derive deterministically driver-side or in a projection; avoids "
    "engine-specific stddev accumulation orders.",
    tags=("E17",),
)
def price_stats_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = dec("p_retailprice")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p).cast("double").alias("sum_price"),
        # re-scale to 6 before the double cast: scale-12 decimal->double
        # conversion rounds differently across engines (int128 path)
        F.sum(p * p).cast("decimal(38,6)").cast("double").alias("sum_sq"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


@register(
    "top20_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="Global top-k (op E22): Spark plans TakeOrderedAndProject — "
    "per-partition heaps, no global sort; deterministic tie-break.",
    tags=("E22", "R4"),
)
def top20_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "all_parties",
    oracle="""
    SELECT c_custkey AS party_key, c_name AS party_name, c_acctbal AS acctbal,
           'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, s_acctbal, 'supplier' FROM supplier
    """,
    doc="UNION ALL (op E23) with schema alignment by name.",
    tags=("E23",),
)
def all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return customer.unionByName(supplier)


@register(
    "nation_coverage",
    oracle="""
    SELECT n_nationkey, 'both' AS presence FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT n_nationkey, 'customers_only' AS presence FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
    doc="INTERSECT / EXCEPT (op E24): set semantics incl. dedup, "
    "composed with a union into one coverage relation.",
    tags=("E24", "E23"),
)
def nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    supp_nations = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    both = cust_nations.intersect(supp_nations).withColumn("presence", F.lit("both"))
    only = cust_nations.subtract(supp_nations).withColumn(
        "presence", F.lit("customers_only")
    )
    return both.unionByName(only)


@register(
    "user_type_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    """,
    doc="Pivot (op E13 wide form): event_type counts as columns; pinned "
    "pivot values keep the schema static (required at scale — dynamic "
    "pivot scans twice).",
    tags=("E13",),
)
def user_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    out = piv
    for c in ["click", "error", "purchase", "signup", "view"]:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


@register(
    "orders_above_nation_avg",
    oracle="""
    SELECT o.o_orderkey, c.c_nationkey,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 2 * (
        SELECT avg(o2.o_totalprice)
        FROM orders o2 JOIN customer c2 ON o2.o_custkey = c2.c_custkey
        WHERE c2.c_nationkey = c.c_nationkey
    )
    ORDER BY o.o_orderkey
    """,
    doc="Correlated scalar subquery (SQL surface beyond the DataFrame "
    "API): orders above 2x their nation's average price. Catalyst "
    "decorrelates into an aggregate + join — no per-row re-execution; "
    "the plan is the same one you'd hand-write, which is the point of "
    "expressing it declaratively.",
    tags=("E13", "E5"),
)
def orders_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_sq_customer")
    return spark.sql(
        """
        SELECT o.o_orderkey, c.c_nationkey,
               CAST(o.o_totalprice AS DOUBLE) AS totalprice
        FROM _sq_orders o JOIN _sq_customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 2 * (
            SELECT avg(o2.o_totalprice)
            FROM _sq_orders o2 JOIN _sq_customer c2 ON o2.o_custkey = c2.c_custkey
            WHERE c2.c_nationkey = c.c_nationkey
        )
        ORDER BY o.o_orderkey
        """
    )


@register(
    "parts_never_ordered",
    oracle="""
    SELECT p_partkey, p_name
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
    )
    ORDER BY p_partkey
    """,
    doc="Correlated NOT EXISTS (anti-join through the SQL surface): "
    "parts with no lineitem. Catalyst rewrites to a left-anti join — "
    "one shuffle, no per-row probe.",
    tags=("E8",),
)
def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_sq_part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_sq_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM _sq_part p
        WHERE NOT EXISTS (
            SELECT 1 FROM _sq_lineitem l WHERE l.l_partkey = p.p_partkey
        )
        ORDER BY p_partkey
        """
    )


@register(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50_cont,
           quantile_disc(l_extendedprice, 0.5) AS p50_disc,
           quantile_cont(l_extendedprice, 0.9) AS p90_cont,
           quantile_disc(l_extendedprice, 0.9) AS p90_disc,
           median(l_extendedprice) AS med,
           quantile_cont(l_quantity, 0.25) AS qty_p25
    FROM lineitem
    GROUP BY 1
    """,
    doc="Exact percentiles (op E17): percentile_cont (interpolating) and "
    "percentile_disc (order-statistic) WITHIN GROUP, plus median. "
    "DEMO-SCALE FORM: exact percentile buffers every value of a group on "
    "one reducer — with only 3 group keys, a reducer holds ~1/3 of the "
    "column at 100 TB. Inherent to exact order statistics, not to this "
    "plan; the scale path is price_approx_percentiles (GK/t-digest "
    "summaries, partial-aggregable, error-bound-tested in "
    "tests/test_sketches.py).",
    tags=("E17", "demo-scale"),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen (r12): the partial percentile buffers (ObjectHashAggregate
    # boxing every value) otherwise build on the ONE scan task
    # (1.43 -> 1.05 s solo at sf0.1)
    li = load_table(spark, sf_dir, "lineitem", widen=True)
    # percentile(col, array(...)) == percentile_cont per element (same
    # interpolation, verified value-identical) but shares ONE per-group
    # value buffer for all requested fractions — each extra WITHIN GROUP
    # expression otherwise buffers+sorts the group again. median ==
    # percentile 0.5 exactly, so it reuses the same buffer too.
    pe = F.percentile("l_extendedprice", F.lit([0.5, 0.9]))
    # percentile_disc also shares one buffer across fractions when given
    # an array (undocumented but stable: ARRAY_PERCENTILE mode)
    pd = F.expr(
        "percentile_disc(array(0.5, 0.9)) WITHIN GROUP (ORDER BY l_extendedprice)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            pe.alias("_pe"),
            pd.alias("_pd"),
            F.percentile("l_quantity", F.lit(0.25)).alias("qty_p25"),
        )
        .select(
            "l_returnflag",
            F.col("_pe")[0].alias("p50_cont"),
            F.col("_pd")[0].alias("p50_disc"),
            F.col("_pe")[1].alias("p90_cont"),
            F.col("_pd")[1].alias("p90_disc"),
            F.col("_pe")[0].alias("med"),
            "qty_p25",
        )
    )


@register(
    "nation_customer_listagg",
    oracle="""
    SELECT n_name, count(*) AS n_cust,
           string_agg(c_name, ',' ORDER BY c_name) AS members,
           array_to_string(list_sort(list(c_name))[1:3], '|') AS top3_alpha
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
    doc="String aggregation (listagg/string_agg shape): collect_list + "
    "array_sort + concat_ws — explicitly ordered, because Spark's "
    "collect_list order is shuffle-dependent; the sort is what makes "
    "the result deterministic (and hash-checkable) at any parallelism. "
    "Broadcast dim join (25 nations), one shuffle on n_name.",
    tags=("E13", "E23"),
)
def nation_customer_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    members = F.array_sort(F.collect_list("c_name"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.concat_ws(",", members).alias("members"),
            F.concat_ws("|", F.slice(members, 1, 3)).alias("top3_alpha"),
        )
    )


@register(
    "price_qty_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_r,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept_r,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx_r,
           round(regr_avgy(l_extendedprice, l_quantity), 6) AS avgy_r,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_r
    FROM lineitem GROUP BY 1
    """,
    doc="Linear-regression aggregates (op E17 breadth): regr_slope/"
    "intercept/count/avgx/avgy + corr, grouped. These are one-pass "
    "partial-aggregable sketches (sum/sum-of-products), so they scale "
    "like any sum at 100 TB. Outputs rounded to 6 decimals: both "
    "engines use numerically different (but stable) accumulation "
    "orders, so the raw doubles differ in the last bits by design.",
    tags=("E17",),
)
def price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("slope_r"),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 6).alias(
            "icept_r"
        ),
        F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"),
        F.round(F.expr("regr_avgx(l_extendedprice, l_quantity)"), 6).alias("avgx_r"),
        F.round(F.expr("regr_avgy(l_extendedprice, l_quantity)"), 6).alias("avgy_r"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_r"),
    )


@register(
    "user_type_pivot_multi",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')  AS click_n,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE event_type = 'click'), 0) AS DOUBLE)
             AS click_sum,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE)
             AS purchase_sum
    FROM events
    GROUP BY 1
    """,
    doc="Multi-aggregate pivot (op E13 wide form, the tail "
    "user_type_pivot doesn't cover): each pinned pivot value fans out "
    "one column PER aggregate (count + exact-decimal sum). Spark's "
    "pivot with a multi-agg agg() names columns value_alias — aliased "
    "back to the oracle's names; still one shuffle, static schema.",
    tags=("E13",),
)
def user_type_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum"),
        )
    )
    return piv.select(
        "user_id",
        F.coalesce(F.col("click_n"), F.lit(0)).alias("click_n"),
        F.coalesce(F.col("click_sum"), F.lit(0.0)).alias("click_sum"),
        F.coalesce(F.col("purchase_n"), F.lit(0)).alias("purchase_n"),
        F.coalesce(F.col("purchase_sum"), F.lit(0.0)).alias("purchase_sum"),
    )
