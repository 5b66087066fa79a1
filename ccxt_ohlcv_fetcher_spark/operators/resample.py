"""OHLCV resampling (op E13) — the engine's flagship aggregation.

The reference ingests fixed-timeframe candles and the canonical analytic
query over such data is re-sampling to a coarser timeframe (1m -> 1h/1d),
using the bucketing rule of `last_candle_is_incomplete`
(`ccxt-ohlcv-fetch.py:141-163`): a bucket is the half-open interval
``[trunc(ts), trunc(ts) + timeframe)``.

Spark-first formulation: one ``groupBy`` with ``min_by``/``max_by`` for
open/close (deterministic first/last by timestamp — Spark's ``first()``
is order-dependent and nondeterministic after a shuffle, so we avoid it)
and plain min/max/sum for high/low/volume. This is a single shuffle with
map-side partial aggregation; at 100 TB it scales linearly and AQE
coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.functions.timeframe import (
    is_calendar_unit,
    parse_timeframe,
    timeframe_to_spark_interval,
)


def bucket_start(ts: Column | str, timeframe: str) -> Column:
    """Truncate a timestamp column to its timeframe bucket start."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    n, unit = parse_timeframe(timeframe)
    if is_calendar_unit(unit):
        if n != 1:
            raise ValueError(f"calendar timeframe {timeframe!r} supports n=1 only")
        return F.date_trunc({"M": "month", "y": "year"}[unit], ts)
    if n == 1 and unit in ("m", "h", "d", "w"):
        name = {"m": "minute", "h": "hour", "d": "day", "w": "week"}[unit]
        return F.date_trunc(name, ts)
    if unit == "w":
        # Monday-anchor every week width: window()'s tumbling grid is
        # epoch-anchored and 1970-01-01 is a Thursday, so shift the grid
        # by 4 days to 1970-01-05 (a Monday). This keeps 'Nw' buckets on
        # the same grid as date_trunc('week') ('1w'), preserving the
        # aligned-bucket nesting a rollup ladder ('1w' -> '2w') relies on.
        interval = timeframe_to_spark_interval(timeframe)
        return F.window(ts, interval, interval, "4 days")["start"]
    # general fixed-width bucket via window() (tumbling)
    return F.window(ts, timeframe_to_spark_interval(timeframe))["start"]


def resample_ohlcv(
    df: DataFrame,
    timeframe: str,
    ts_col: str = "ts",
    price_col: str = "value",
    volume_col: str | None = None,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Roll a tick/candle stream up to coarser OHLCV buckets.

    Output columns: ``keys..., bucket_ts, open, high, low, close, volume``
    (volume = count(*) when no volume column exists, e.g. raw ticks).
    """
    ts = F.col(ts_col)
    price = F.col(price_col)
    vol = F.sum(volume_col) if volume_col else F.count(F.lit(1)).cast("double")
    return (
        df.withColumn("bucket_ts", bucket_start(ts, timeframe))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.min_by(price, ts).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, ts).alias("close"),
            vol.alias("volume"),
        )
    )


def resample_candles(
    candles: DataFrame,
    timeframe: str,
    ts_col: str = "timestamp",
    keys: tuple[str, ...] = ("exchange", "symbol"),
) -> DataFrame:
    """Candles -> coarser candles (1m -> 5m -> 1h ...): the hypertable-
    rollup analog over the ingested dataset (epoch-ms ``timestamp``
    column per `ccxt-ohlcv-fetch.py:38`).

    OHLC composition law: open = open of the earliest child candle,
    close = close of the latest, high/low/volume = max/min/sum — which
    makes the rollup **associative**: 1m->5m->1h equals 1m->1h exactly
    (property-tested in tests/test_resample_chain.py). Associativity is
    what lets a 100 TB pipeline maintain coarse rollups incrementally
    from fine ones instead of re-scanning raw ticks.
    """
    ts = F.timestamp_millis(F.col(ts_col))
    bucket_ms = F.unix_millis(bucket_start(ts, timeframe))
    return (
        candles.withColumn("bucket_ts", bucket_ms)
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.min_by("open", F.col(ts_col)).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col(ts_col)).alias("close"),
            F.sum("volume").alias("volume"),
        )
        .withColumnRenamed("bucket_ts", ts_col)
    )
