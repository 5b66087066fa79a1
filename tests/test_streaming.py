"""Structured Streaming semantics tests (ops E28s-E32s): streamed OHLCV
equals the batch resample; watermark close-out; idempotent sink under
restart; sliding/session windows.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
from ccxt_ohlcv_fetcher_spark.streaming.candles import (
    TICK_SCHEMA,
    read_tick_stream,
    session_windows,
    sliding_volume,
    start_candle_sink,
    streaming_ohlcv,
)

T0 = 1700000000 * 1000 - (1700000000 % 3600) * 1000  # hour-aligned ms


def make_ticks(spark, n: int, step_ms: int = 10_000):
    rows = [
        (
            F.lit(None),  # placeholder, replaced below
        )
    ]
    data = [
        ((T0 + i * step_ms) / 1000.0, "bitfinex", "XRPUSD", 100.0 + (i % 7), 2.0)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [(float(ts), e, s, p, a) for ts, e, s, p, a in data],
        "ts double, exchange string, symbol string, price double, amount double",
    )
    return df.withColumn("ts", F.timestamp_seconds("ts"))


@pytest.fixture()
def tick_dir(spark, tmp_path):
    """Land ticks as multiple parquet files (micro-batch boundaries)."""
    path = str(tmp_path / "ticks")
    ticks = make_ticks(spark, 360)  # 1 hour of 10s ticks
    ticks.filter(F.col("ts") < F.timestamp_millis(F.lit(T0 + 1_200_000))).coalesce(
        1
    ).write.mode("append").parquet(path)
    ticks.filter(F.col("ts") >= F.timestamp_millis(F.lit(T0 + 1_200_000))).coalesce(
        1
    ).write.mode("append").parquet(path)
    return path


def test_streaming_ohlcv_matches_batch(spark, tmp_path, tick_dir):
    ds = CandleDataset(spark, str(tmp_path / "candles"))
    stream = read_tick_stream(spark, tick_dir)
    candles = streaming_ohlcv(stream, "5m")
    q = start_candle_sink(candles, ds, "5m", str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = ds.read("bitfinex", "XRPUSD", "5m").orderBy("timestamp")
    rows = got.collect()
    # watermark close-out: the final (incomplete) 5m bucket is NOT emitted
    # in append mode until the watermark passes its end. 360 ticks cover
    # exactly 12 buckets; the last bucket closes only when later data
    # arrives, so 11 complete buckets are expected (E30s).
    assert len(rows) == 11
    # batch-parity on the emitted buckets
    batch = (
        make_ticks(spark, 360)
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.min_by("price", "ts").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", "ts").alias("close"),
            F.sum("amount").alias("volume"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("timestamp"),
            "open", "high", "low", "close", "volume",
        )
        .orderBy("timestamp")
        .collect()
    )
    for s_row, b_row in zip(rows, batch[:11]):
        assert s_row["timestamp"] == b_row["timestamp"]
        assert float(s_row["open"]) == b_row["open"]
        assert float(s_row["close"]) == b_row["close"]
        assert float(s_row["volume"]) == b_row["volume"]


def test_streaming_sink_idempotent_on_restart(spark, tmp_path, tick_dir):
    """Replaying the stream from a fresh checkpoint re-delivers every
    micro-batch; the anti-join sink must not duplicate (E31s/R3)."""
    ds = CandleDataset(spark, str(tmp_path / "candles"))
    for ckpt in ("ckpt_a", "ckpt_b"):  # second run = full re-delivery
        stream = read_tick_stream(spark, tick_dir)
        candles = streaming_ohlcv(stream, "5m")
        q = start_candle_sink(candles, ds, "5m", str(tmp_path / ckpt))
        q.awaitTermination(120)
    got = ds.read("bitfinex", "XRPUSD", "5m")
    assert got.count() == 11
    assert got.select("timestamp").distinct().count() == 11


def test_sliding_and_session_windows_batch_semantics(spark):
    # run the same definitions in batch mode (windows are engine-shared)
    ticks = make_ticks(spark, 24, step_ms=300_000)  # 5-min spaced ticks, 2h
    sliding = (
        ticks.groupBy(F.col("symbol"), F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_ticks"))
        .collect()
    )
    # each tick lands in exactly 2 overlapping hour windows
    assert sum(r["n_ticks"] for r in sliding) == 48
    gaps = make_ticks(spark, 4, step_ms=2_400_000)  # 40-min gaps -> 4 sessions
    sess = (
        gaps.groupBy(F.col("symbol"), F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(sess) == 4
