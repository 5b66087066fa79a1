"""Window-function queries (SURVEY.md §2.5, ops E18-E21) plus batch
sessionization (the batch analog of session windows, op E32s).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ccxt_ohlcv_fetcher_spark.plans.registry import dec, ms, register, sql_ms
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


@register(
    "event_deltas",
    oracle=f"""
    SELECT event_id, user_id, {sql_ms("ts")} AS ts_ms,
           lag(event_id) OVER w AS prev_event_id,
           {sql_ms("ts")} - lag({sql_ms("ts")}) OVER w AS gap_ms,
           lead(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead (op E19): inter-event gap per user — the gap-detection "
    "primitive for candle streams (cursor logic, ccxt-ohlcv-fetch.py:104,120).",
    tags=("E19",),
)
def event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = ms("ts")
    return events.select(
        "event_id",
        "user_id",
        t.alias("ts_ms"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        (t - F.lag(t).over(w)).alias("gap_ms"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "moving_stats",
    oracle=f"""
    SELECT event_id, user_id, {sql_ms("ts")} AS ts_ms,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w5 AS DOUBLE)
             / count(*) OVER w5 AS mavg_5,
           max(value) OVER w5 AS mmax_5,
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum
    FROM events
    WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    doc="Frame-spec aggregates (ops E20/E21): 5-row moving average/max and "
    "running sum per user; decimal accumulation keeps the moving sums "
    "bit-identical across engines.",
    tags=("E20", "E21"),
)
def moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w5 = w.rowsBetween(-4, 0)
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    return events.select(
        "event_id",
        "user_id",
        ms("ts").alias("ts_ms"),
        (F.sum(dec("value")).over(w5).cast("double") / F.count(F.lit(1)).over(w5)).alias(
            "mavg_5"
        ),
        F.max("value").over(w5).alias("mmax_5"),
        F.sum(dec("value")).over(wcum).cast("double").alias("running_sum"),
    )


@register(
    "top3_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             dense_rank() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    WHERE rnk <= 3
    """,
    doc="Ranking window (op E18) + top-k per group (op E22): dense_rank "
    "over a joined fact, deterministic tie-break on orderkey.",
    tags=("E18", "E22", "E5"),
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.dense_rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "user_sessions",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN {sql_ms("ts")} - lag({sql_ms("ts")})
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000 OR lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           {sql_ms("min(ts)")} AS session_start_ms,
           {sql_ms("max(ts)")} AS session_end_ms,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY 1, 2
    """,
    doc="Sessionization (batch analog of session_window, op E32s): "
    "30-minute inactivity gap splits sessions; lag -> flag -> running sum "
    "-> group. Two window passes + one groupBy, all on the user_id key.",
    tags=("E32s", "E19", "E21"),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ms("ts") - F.lag(ms("ts")).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            # event_id tie-break matches the lag() window: tied-ts rows at a
            # session boundary must take session ids in one deterministic
            # peer order on both engines
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ms(F.min("ts")).alias("session_start_ms"),
        ms(F.max("ts")).alias("session_end_ms"),
        F.sum(dec("value")).cast("double").alias("session_value"),
    )


@register(
    "order_rank_analytics",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(o_orderkey) OVER w AS cheapest_key,
           nth_value(o_orderkey, 2) OVER wf AS second_key,
           last_value(o_orderkey) OVER wf AS priciest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey),
      wf AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Distribution/navigation window functions (op E18 breadth): "
    "ntile, percent_rank, cume_dist, first/nth/last_value. The "
    "value-navigation trio runs over the full-partition frame (default "
    "frame stops at CURRENT ROW, where last_value degenerates to the "
    "row itself). Order key includes o_orderkey so ranks are total — "
    "the determinism convention every ranking query here follows.",
    tags=("E18",),
)
def order_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first_value("o_orderkey").over(w).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        F.last_value("o_orderkey").over(wf).alias("priciest_key"),
    )


@register(
    "user_state_scd2",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, state,
           {sql_ms("ts")} AS valid_from_ms,
           lead({sql_ms("ts")}) OVER w AS valid_to_ms,
           CAST(lead(ts) OVER w IS NULL AS BOOLEAN) AS is_current,
           CAST(row_number() OVER w AS INT) AS version
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD type-2 snapshot from an event log (warehouse/CDC op, ops "
    "E18/E19): collapse each user's event stream into state validity "
    "intervals [valid_from, valid_to) — rows where the state differs "
    "from its predecessor open a version, the next change closes it, "
    "the open interval is flagged current. Two windows over the same "
    "(user_id, ts, event_id) sort: Catalyst plans ONE shuffle + ONE "
    "sort and chains both Window operators on it — the change-point "
    "filter between them preserves the ordering and partitioning, so "
    "the SCD2 build costs exactly one exchange at any scale.",
    tags=("E18", "E19"),
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_in = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w_in))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = ms("ts")
    return changes.select(
        "user_id",
        "state",
        t.alias("valid_from_ms"),
        F.lead(t).over(w).alias("valid_to_ms"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )


@register(
    "event_trailing_hour_stats",
    oracle=f"""
    SELECT event_id, user_id, {sql_ms("ts")} AS ts_ms,
           count(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {sql_ms("ts")}
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-interval RANGE frame (op E20 tail the rows-frame queries "
    "don't cover): trailing-one-hour event count and exact-decimal "
    "value sum per user, framed by the epoch-ms VALUE range rather "
    "than a row count — the frame width adapts to event density, and "
    "equal-timestamp peers share a frame deterministically (no "
    "tie-break needed: RANGE frames are value-defined). One shuffle on "
    "user_id; Spark evaluates the sliding frame incrementally.",
    tags=("E20",),
)
def event_trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(ms("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        ms("ts").alias("ts_ms"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_1h"),
    )
