"""Relational breadth queries over the TPC-H-ish star schema
(SURVEY.md §2.2-§2.7, E-tier — the reference implements no joins, §2.3).
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
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity")} AS sum_qty,
           {sql_dsum("l_extendedprice")} AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l_discount AS DECIMAL(18,6))))
                     AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
           {sql_davg("l_quantity")} AS avg_qty,
           {sql_davg("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary (ops E3/E13/E16-adjacent): "
    "filter pushed to the parquet scan, grouped sums/avgs with exact "
    "decimal accumulation, map-side partial agg.",
    tags=("E3", "E13"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,6)").cast("double").alias(
                "sum_disc_price"
            ),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,6))))
                     AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    doc="Star-schema rollup (ops E5 equi-join + E6 broadcast): fact table "
    "joins dims; nation/region/customer are explicitly broadcast so the "
    "plan has exactly one shuffle (the final groupBy) at any scale.",
    tags=("E5", "E6", "E13"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(nation.n_name.alias("nation"), region.r_name.alias("region"))
        .agg(
            F.sum(revenue).cast("decimal(38,6)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "customer_order_stats",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           COALESCE({sql_dsum("o.o_totalprice")}, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
    doc="Left-outer join preserving zero-order customers (op E7), grouped "
    "counts; count(col) skips nulls from the outer side in both engines.",
    tags=("E7", "E13"),
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@register(
    "part_attrs_unpivot",
    oracle="""
    SELECT p_partkey, attr, CAST(val AS DOUBLE) AS val
    FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice
          FROM part)
    UNPIVOT (val FOR attr IN (p_size, p_retailprice))
    """,
    doc="Unpivot/melt (wide -> long): the DataFrame `unpivot` operator "
    "(SQL UNPIVOT). Pure projection fan-out — no shuffle; rows scale by "
    "the number of unpivoted columns.",
    tags=("E4",),
)
def part_attrs_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_size", "p_retailprice")
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")
        .withColumn("val", F.col("val").cast("double"))
    )


@register(
    "top2_orders_lateral",
    oracle="""
    SELECT c.o_custkey, t.o_orderkey, t.o_totalprice
    FROM (SELECT DISTINCT o_custkey FROM orders) c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.o_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    """,
    doc="Lateral (correlated) join through the SQL surface: top-2 orders "
    "per customer as a per-row subquery. Catalyst rewrites the "
    "correlated limit into a window rank + filter — same physical plan "
    "as the explicit row_number() formulation (top3_orders_per_segment), "
    "pinned here so both surfaces stay available.",
    tags=("E18", "E22"),
)
def top2_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.o_custkey, t.o_orderkey, t.o_totalprice
        FROM (SELECT DISTINCT o_custkey FROM _lat_orders) c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM _lat_orders o
          WHERE o.o_custkey = c.o_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


@register(
    "priority_multiset_ops",
    oracle="""
    WITH a AS (
      SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'F'
    ),
    b AS (
      SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'O'
    ),
    i AS (SELECT pri FROM a INTERSECT ALL SELECT pri FROM b),
    e AS (SELECT pri FROM a EXCEPT ALL SELECT pri FROM b)
    SELECT 'intersect_all' AS op, pri, count(*) AS n FROM i GROUP BY 2
    UNION ALL
    SELECT 'except_all', pri, count(*) AS n FROM e GROUP BY 2
    """,
    doc="Multiset set operations (op E24 tail): INTERSECT ALL keeps "
    "min(multiplicity) per value, EXCEPT ALL subtracts multiplicities — "
    "the bag semantics DISTINCT set ops lose. Spark plans both as a "
    "single aggregate computing per-value counts on each side then "
    "replicating rows (no join); the summary groupBy keeps the output "
    "deterministic.",
    tags=("E24",),
)
def priority_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("pri")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("pri")
    )
    i = (
        a.intersectAll(b)
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "pri", "n")
    )
    e = (
        a.exceptAll(b)
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "pri", "n")
    )
    return i.unionAll(e)
