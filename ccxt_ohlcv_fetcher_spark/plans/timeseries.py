"""Time-series queries — the reference's own domain, Spark-ified.

Maps the candle pipeline's implicit operators (SURVEY.md §2.1/§2.4) onto
the driver's ``events`` stream table: OHLCV resampling (E13, flagship),
resume-offset scan (R4), latest-row-per-key (R4 generalized via E18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ccxt_ohlcv_fetcher_spark.operators.resample import resample_ohlcv
from ccxt_ohlcv_fetcher_spark.plans.registry import ms, register, sql_ms
from ccxt_ohlcv_fetcher_spark.sources.tables import load_table


@register(
    "resample_ohlcv_1h",
    oracle=f"""
    SELECT {sql_ms("date_trunc('hour', ts)")} AS bucket_ms,
           arg_min(value, ts) AS open,
           max(value)         AS high,
           min(value)         AS low,
           arg_max(value, ts) AS close,
           CAST(count(*) AS DOUBLE) AS volume
    FROM events
    GROUP BY 1
    """,
    doc="Flagship: roll the events stream up to hourly OHLCV candles "
    "(op E13; bucketing rule from ccxt-ohlcv-fetch.py:141-163). "
    "Single shuffle, map-side partial agg; min_by/max_by instead of "
    "order-dependent first()/last().",
    tags=("E13", "R10", "R11"),
)
def resample_ohlcv_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = resample_ohlcv(events, "1h", ts_col="ts", price_col="value")
    return out.select(
        ms("bucket_ts").alias("bucket_ms"), "open", "high", "low", "close", "volume"
    )


@register(
    "resume_offsets",
    oracle=f"""
    SELECT user_id,
           {sql_ms("max(ts)")} AS last_ms,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    doc="Resume-offset scan (op R4, ccxt-ohlcv-fetch.py:86-91) generalized "
    "to a partitioned dataset: newest stored timestamp per key. On parquet "
    "this is served by footer min/max stats + aggregate pushdown.",
    tags=("R4",),
)
def resume_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        ms(F.max("ts")).alias("last_ms"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "latest_event_per_user",
    oracle=f"""
    SELECT user_id, event_id, {sql_ms("ts")} AS ts_ms, event_type, value
    FROM (
      SELECT *,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    doc="Top-1-per-partition (op E18 ranking; generalizes the reference's "
    "ORDER BY timestamp DESC LIMIT 1 resume query, ccxt-ohlcv-fetch.py:87). "
    "One shuffle + per-partition sort; ts ties broken by event_id.",
    tags=("R4", "E18", "E22"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", ms("ts").alias("ts_ms"), "event_type", "value")
    )
