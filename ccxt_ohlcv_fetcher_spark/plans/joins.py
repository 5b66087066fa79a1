"""Join-family queries (SURVEY.md §2.3, ops E5-E12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.joins import asof_join, banded_range_join
from ccxt_ohlcv_fetcher_spark.plans.registry import dec, ms, register, sql_ms
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


@register(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (op E8) — the PK-conflict dedup primitive of the "
    "reference (ccxt-ohlcv-fetch.py:71-75) as a standalone relational op.",
    tags=("E8",),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    doc="Left-semi join (op E8): EXISTS without duplicating left rows.",
    tags=("E8",),
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "events_value_bands",
    oracle="""
    WITH bands AS (
      SELECT band_id, CAST(band_id * 50 AS DOUBLE) AS lo,
             CAST((band_id + 1) * 50 AS DOUBLE) AS hi
      FROM (SELECT unnest(range(0, 20)) AS band_id)
    )
    SELECT b.band_id, b.lo, b.hi,
           count(e.event_id) AS n_events,
           count(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1, 2, 3
    """,
    doc="Theta/range join (op E9): point-in-interval via banded equi-join "
    "— the range predicate becomes an equi-join on a computed band id, so "
    "Catalyst plans a hash join instead of BroadcastNestedLoop.",
    tags=("E9",),
)
def events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bands = spark.range(0, 20).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50).cast("double").alias("lo"),
        ((F.col("id") + 1) * 50).cast("double").alias("hi"),
    )
    joined = banded_range_join(
        events.withColumn("_pt", F.col("value")),
        bands.withColumn("_lo", F.col("lo")).withColumn("_hi", F.col("hi")),
        left_point="_pt",
        right_lo="_lo",
        right_hi="_hi",
        band_width=50,
    )
    return (
        joined.groupBy("band_id", "lo", "hi")
        .agg(
            F.count("event_id").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "purchase_last_error_asof",
    oracle=f"""
    SELECT p.event_id, p.user_id, {sql_ms("p.ts")} AS ts_ms,
           e.event_id AS last_error_id,
           {sql_ms("e.ts")} AS last_error_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    doc="As-of join (op E10): nearest prior error per purchase, per user. "
    "Spark formulation: union + last(ignorenulls) window — one shuffle on "
    "the key, no nested loop (operators/joins.py). Oracle: DuckDB's "
    "native ASOF JOIN.",
    tags=("E10",),
)
def purchase_last_error_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("err_ts")
    )
    out = asof_join(
        purchases,
        errors,
        keys=["user_id"],
        left_ts="ts",
        right_ts="err_ts",
        right_payload=["err_id", "err_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        ms("ts").alias("ts_ms"),
        F.col("asof_err_id").alias("last_error_id"),
        ms("asof_err_ts").alias("last_error_ms"),
    )


@register(
    "purchase_last_error_asof_tol",
    oracle=f"""
    SELECT p.event_id, p.user_id, {sql_ms("p.ts")} AS ts_ms,
           e.event_id AS last_error_id,
           {sql_ms("e.ts")} AS last_error_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT * FROM events e
      WHERE e.event_type = 'error' AND e.user_id = p.user_id
        AND e.ts <= p.ts AND e.ts >= p.ts - INTERVAL 1 HOUR
      ORDER BY e.ts DESC LIMIT 1
    ) e ON TRUE
    """,
    doc="As-of join with TOLERANCE (op E10, pandas merge_asof "
    "tolerance semantics): nearest prior error per purchase, but only "
    "within the last hour — the stale-quote cutoff every market-data "
    "join needs. Same single-shuffle union+window plan as the "
    "unbounded form (operators/joins.py:asof_join): the matched row's "
    "own timestamp rides in the payload and out-of-window matches "
    "null out afterwards, no extra join. Oracle: LATERAL top-1 with "
    "the window predicate.",
    tags=("E10",),
)
def purchase_last_error_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("err_ts")
    )
    out = asof_join(
        purchases,
        errors,
        keys=["user_id"],
        left_ts="ts",
        right_ts="err_ts",
        right_payload=["err_id", "err_ts"],
        tolerance=3600,  # seconds (TimestampType delta domain)
    )
    return out.select(
        "event_id",
        "user_id",
        ms("ts").alias("ts_ms"),
        F.col("asof_err_id").alias("last_error_id"),
        ms("asof_err_ts").alias("last_error_ms"),
    )


@register(
    "events_in_error_windows",
    oracle=f"""
    SELECT w.err_id, count(e.event_id) AS n_events,
           {sql_ms("w.win_start")} AS win_start_ms
    FROM (
      SELECT event_id AS err_id, user_id, ts AS win_start,
             ts + INTERVAL 1 HOUR AS win_end
      FROM events WHERE event_type = 'error'
    ) w
    JOIN events e
      ON e.user_id = w.user_id
     AND e.ts >= w.win_start AND e.ts < w.win_end
     AND e.event_type <> 'error'
    GROUP BY 1, 3
    """,
    doc="Interval-overlap join (op E11): non-error events falling inside "
    "the hour after each error, same user. Banded on epoch-hour + equi "
    "user key -> plain shuffled join at scale.",
    tags=("E11", "E9"),
)
def events_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    HOUR_MS = 3_600_000
    windows = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("w_user"),
            ms("ts").alias("win_start"),
            (ms("ts") + HOUR_MS).alias("win_end"),
        )
    )
    pts = events.filter(F.col("event_type") != "error").select(
        "event_id", "user_id", ms("ts").alias("pt")
    )
    joined = banded_range_join(
        pts,
        windows,
        left_point="pt",
        right_lo="win_start",
        right_hi="win_end",
        band_width=HOUR_MS,
        keys=[],
        how="inner",
    ).filter(F.col("user_id") == F.col("w_user"))
    return joined.groupBy("err_id", "win_start").agg(
        F.count("event_id").alias("n_events")
    ).select("err_id", "n_events", F.col("win_start").alias("win_start_ms"))


@register(
    "region_type_matrix",
    oracle="""
    SELECT r.r_name AS region, t.event_type,
           COALESCE(a.n, 0) AS n_events
    FROM region r
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    LEFT JOIN (
      SELECT n.n_regionkey AS rk, e.event_type AS et, count(*) AS n
      FROM events e
      JOIN nation n ON e.user_id % 25 = n.n_nationkey
      GROUP BY 1, 2
    ) a ON a.rk = r.r_regionkey AND a.et = t.event_type
    """,
    doc="Cross join (op E12) building a dense region × event_type matrix, "
    "densified with a left join so empty cells appear as zeros.",
    tags=("E12", "E7"),
)
def region_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    events = load_table(spark, sf_dir, "events")
    types = events.select("event_type").distinct()
    counts = (
        events.join(
            F.broadcast(nation),
            events.user_id % 25 == nation.n_nationkey,
        )
        .groupBy(F.col("n_regionkey").alias("rk"), F.col("event_type").alias("et"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        region.crossJoin(types)
        .join(
            counts,
            (F.col("rk") == F.col("r_regionkey")) & (F.col("et") == F.col("event_type")),
            "left",
        )
        .select(
            F.col("r_name").alias("region"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@register(
    "hot_user_event_enrich",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CASE WHEN user_id % 2 = 0 THEN -1 ELSE user_id END AS skew_key
      FROM events
    ),
    dim AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN -1 ELSE c_custkey END AS skew_key,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(c_acctbal) AS avg_bal
      FROM customer
      GROUP BY 1
    )
    SELECT ev.event_id, ev.user_id, ev.skew_key, dim.n_cust, dim.avg_bal
    FROM ev LEFT JOIN dim USING (skew_key)
    """,
    doc="Skew-mitigated hot-key join (SURVEY.md §4 scale posture): every "
    "even user_id collapses onto one sentinel key (~50% of the fact side "
    "on a single join key — the degenerate-symbol shape that melts one "
    "shuffle partition at 100 TB), then joins through "
    "operators/joins.salted_join: the hot key's rows spread across 8 "
    "salts, the dim side replicates per salt. The oracle is a plain "
    "unsalted join — passing proves salting is semantics-preserving. At "
    "cluster scale the same shape is also covered by AQE skew-split "
    "(tests/test_skew_aqe.py); explicit salting is the mitigation that "
    "works even when a same-key downstream agg pins the partitioning.",
    tags=("E5", "E6"),
)
def hot_user_event_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.joins import salted_join
    from ccxt_ohlcv_fetcher_spark.plans.registry import davg

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    skew = lambda c: F.when(F.col(c) % 2 == 0, F.lit(-1)).otherwise(F.col(c))  # noqa: E731
    ev = events.select("event_id", "user_id", skew("user_id").alias("skew_key"))
    dim = (
        customer.groupBy(skew("c_custkey").cast("long").alias("skew_key"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            davg("c_acctbal").alias("avg_bal"),
        )
    )
    return salted_join(ev, dim, ["skew_key"], n_salts=8, how="left").select(
        "event_id", "user_id", "skew_key", "n_cust", "avg_bal"
    )


@register(
    "price_balance_bucket_full_outer",
    oracle="""
    WITH a AS (
      SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT CAST(floor(c_acctbal / 2000) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1
    )
    SELECT coalesce(a.bucket, b.bucket) AS bucket, a.n_orders, b.n_cust
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    """,
    doc="Full outer join (op E7): order-value buckets vs account-balance "
    "buckets — each side holds keys the other lacks (high price buckets "
    "have no balance twin; the negative-balance bucket has no price "
    "twin), so both null-extension directions are exercised. Right "
    "outer is this shape's one-sided sugar (covered by symmetry with "
    "the left joins elsewhere). Two tiny aggregates, SMJ on ~12 keys.",
    tags=("E7",),
)
def price_balance_bucket_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.groupBy(
        F.floor(F.col("o_totalprice") / 50000).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    b = customer.groupBy(
        F.floor(F.col("c_acctbal") / 2000).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_cust"))
    return (
        a.join(b, "bucket", "full_outer")
        .select("bucket", "n_orders", "n_cust")
    )


@register(
    "purchase_next_error_asof",
    oracle=f"""
    SELECT p.event_id, p.user_id, {sql_ms("p.ts")} AS ts_ms,
           e.event_id AS next_error_id,
           {sql_ms("e.ts")} AS next_error_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts <= e.ts
    """,
    doc="Forward as-of join (op E10, the merge_asof direction='forward' "
    "mode): EARLIEST error at-or-after each purchase, per user — the "
    "\"what broke next\" formulation. Same single-shuffle union + "
    "window plan as the backward form, with a running first() over the "
    "following frame (operators/joins.py asof_join direction=). "
    "Oracle: DuckDB native ASOF with the inequality flipped.",
    tags=("E10",),
)
def purchase_next_error_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("err_ts")
    )
    out = asof_join(
        purchases,
        errors,
        keys=["user_id"],
        left_ts="ts",
        right_ts="err_ts",
        right_payload=["err_id", "err_ts"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        ms("ts").alias("ts_ms"),
        F.col("asof_err_id").alias("next_error_id"),
        ms("asof_err_ts").alias("next_error_ms"),
    )


@register(
    "bucketed_segment_revenue",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc="Shuffle-free co-located join via SNAPSHOT-LOGGED bucketed "
    "tables (op E5 at its 100 TB shape, r10: the layout is now a "
    "durable governed artifact): orders and customer are written once "
    "through the bucketBy writer onto a snapshot log (bucket key + "
    "count in the manifest, operators/bucketed_log.py), and the read "
    "resolves the manifest's exact files as a CLUSTERED BY external "
    "table — the scan carries HashPartitioning, so the sort-merge join "
    "needs NO Exchange on either side; the per-query shuffle that "
    "dominates repeated fact-table joins at scale is paid once at "
    "ingest, with ACID commits/time travel/retention around it. The "
    "only shuffle left is the 5-row segment rollup. Plan shape pinned "
    "(broadcast disabled = the neither-side-fits regime) in "
    "tests/test_bucketed.py; values strategy-agnostic via this oracle.",
    tags=("E5", "E13"),
)
def bucketed_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.bucketed_log import (
        logged_bucketed_view,
    )
    from ccxt_ohlcv_fetcher_spark.plans.registry import dsum

    o = logged_bucketed_view(spark, sf_dir, "orders", "o_custkey", 8)
    c = logged_bucketed_view(spark, sf_dir, "customer", "c_custkey", 8)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "bucketed_custkey_order_stats",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_spend,
           MAX(o_totalprice) AS max_order
    FROM orders
    GROUP BY 1
    ORDER BY total_spend DESC, o_custkey
    LIMIT 20
    """,
    doc="ZERO-shuffle aggregation on a SNAPSHOT-LOGGED bucketed table "
    "(op E13 + E22, r10): the per-custkey agg runs entirely within "
    "buckets (the logged table's scan partitioning already satisfies "
    "the distribution) and the top-20 is a TakeOrderedAndProject — the "
    "whole query executes with no Exchange at all, the plan you want "
    "when the same per-key rollup runs hourly over a 100 TB fact "
    "table, now from a governed table with time travel. Pinned in "
    "tests/test_bucketed.py.",
    tags=("E13", "E22"),
)
def bucketed_custkey_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.bucketed_log import (
        logged_bucketed_view,
    )
    from ccxt_ohlcv_fetcher_spark.plans.registry import dsum

    o = logged_bucketed_view(spark, sf_dir, "orders", "o_custkey", 8)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
            F.max("o_totalprice").alias("max_order"),
        )
        .orderBy(F.desc("total_spend"), "o_custkey")
        .limit(20)
    )


@register(
    "sole_slow_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 80 DAY)
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 25
    """,
    doc="TPC-H Q21's decorrelation shape (ops E5+E8+E13+E22, adapted to "
    "the fixture's shipdate-only schema: late = shipped >80 days after "
    "order date): suppliers who were the SOLE late shipper on a "
    "multi-supplier order. The oracle states it as correlated "
    "EXISTS/NOT-EXISTS; the Spark plan rewrites both subqueries into ONE "
    "per-order aggregate whose supplier SETS (bounded by suppliers-per-"
    "order) answer both tests — EXISTS(other supplier) = n_supp >= 2, "
    "NOT EXISTS(other LATE supplier) = exactly one late supplier — and, "
    "because the qualifying order has exactly one late supplier, that "
    "supplier and its late-row count ride the same row, so there is NO "
    "join back onto the fact rows (r12: the earlier form aggregated "
    "per-order countDistincts through an Expand AND re-ran the "
    "lineitem⋈orders subtree for the outer rows; 2.09 -> 1.79 s solo "
    "at sf0.1). At 100 TB: one fact exchange to orderkey, a broadcast "
    "of the supplier dim and a 25-row TakeOrdered.",
    tags=("E5", "E8", "E13", "E22"),
)
def sole_slow_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    dated = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAY"),
    )
    # ONE exchange over the fact join (guide §2.4): the former shape ran
    # the lineitem⋈orders subtree twice (per-order countDistinct
    # aggregate + the outer late rows) and the two countDistincts
    # planned an Expand (2x rows into the exchange). One per-order
    # aggregate carries everything instead: supplier sets (bounded by
    # suppliers-per-order, ~4 in TPC-H shapes) answer both EXISTS
    # tests, and because a qualifying order has EXACTLY ONE late
    # supplier, that supplier and its late-row count ride the same row
    # — no join back. late_rows already folds the status-F outer
    # condition (o_orderstatus is constant per order). Measured at
    # sf0.1: 2.09 -> 1.79 s solo vs the two-pass form.
    per_order = dated.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).alias("n_supp"),
        F.collect_set(
            F.when(F.col("_late"), F.col("l_suppkey"))
        ).alias("_late_supps"),
        F.sum(
            F.when(
                F.col("_late") & (F.col("o_orderstatus") == "F"), 1
            ).otherwise(0)
        ).alias("_late_rows"),
    )
    return (
        per_order.filter(
            (F.col("n_supp") >= 2)
            & (F.size("_late_supps") == 1)
            & (F.col("_late_rows") > 0)
        )
        .select(
            F.element_at("_late_supps", 1).alias("_late_supp"),
            "_late_rows",
        )
        .join(F.broadcast(supplier), F.col("_late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("_late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


@register(
    "idle_rich_customers_by_nation",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS totacctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q22's shape (ops E8+E13 + uncorrelated scalar subquery, "
    "adapted: the fixture has no phone column and every customer has "
    "SOME order, so the anti condition is 'no order since 2001-01-01'): "
    "above-average-balance customers gone idle, rolled up by nation. "
    "Spark: the scalar average is a 1-row broadcast cross join (the "
    "allowlisted scalar-combine BNLJ shape), the NOT EXISTS a left-anti "
    "join against the date-filtered orders (filter pushed to the scan), "
    "the nation dim a broadcast. AVG stays plain double: both engines "
    "compute sum/count of the SAME filtered set in one partial-agg pass, "
    "and the comparison threshold tolerates last-bit wobble because no "
    "fixture balance sits within 1e-9 of the average.",
    tags=("E8", "E13"),
)
def idle_rich_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    from ccxt_ohlcv_fetcher_spark.plans.registry import dsum

    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "dpp_conversion_rollup",
    oracle="""
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events e
    WHERE e.event_type IN ('purchase', 'signup')
    GROUP BY 1 ORDER BY 1
    """,
    doc="Dynamic partition pruning (scan-layer op beyond E5): the fact "
    "side is events rewritten partitionBy(event_type), the filter lives "
    "on a MATERIALIZED dimension's category attribute, so which fact "
    "partitions survive is unknowable at plan time — Spark inserts a "
    "dynamicpruningexpression subquery that reuses the dim broadcast "
    "and skips the non-conversion partitions before reading a byte "
    "(2 of 5 directories scanned; shape pinned in "
    "tests/test_partitioned_dpp.py). The oracle states the equivalent "
    "static predicate because DuckDB sees one flat parquet file — "
    "values must match whichever way the engine prunes.",
    tags=("E5", "E13"),
)
def dpp_conversion_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccxt_ohlcv_fetcher_spark.operators.partitioned import (
        partitioned_events_with_dim,
    )
    from ccxt_ohlcv_fetcher_spark.plans.registry import dsum

    fact, dim = partitioned_events_with_dim(spark, sf_dir)
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("category") == "conversion")),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("value_sum"),
        )
        .orderBy("event_type")
    )
