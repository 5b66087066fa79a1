"""Streaming breadth: stream-stream join within watermark, streaming
dedup (dropDuplicatesWithinWatermark), and the Spark 4
transformWithStateInPandas stateful API (running VWAP).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from ccxt_ohlcv_fetcher_spark.streaming.joins import dedup_tick_stream, join_trades_quotes
from ccxt_ohlcv_fetcher_spark.streaming.state import (
    TRANSFORM_WITH_STATE_AVAILABLE,
    running_vwap,
    running_vwap_legacy,
)

T0 = 1700000000 * 1000 - (1700000000 % 3600) * 1000  # hour-aligned ms
SEC = 1000


def _write(spark, path: str, rows: list[tuple], schema: str) -> None:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _ts(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.timestamp_millis(c))
    return df


def test_stream_stream_join_matches_batch(spark, tmp_path):
    trade_rows = [
        (T0 + i * 10 * SEC, "XRPUSD", 100.0 + i, 2.0) for i in range(12)
    ] + [(T0 + 300 * SEC, "BTCUSD", 40_000.0, 0.1)]
    quote_rows = [
        (T0 + i * 15 * SEC, "XRPUSD", 99.0 + i, 101.0 + i) for i in range(8)
    ] + [(T0 + 295 * SEC, "BTCUSD", 39_990.0, 40_010.0)]
    tdir, qdir = str(tmp_path / "trades"), str(tmp_path / "quotes")
    tschema = "ts long, symbol string, price double, amount double"
    qschema = "qts long, symbol string, bid double, ask double"
    # two files per side -> multiple micro-batches
    _write(spark, tdir, trade_rows[:6], tschema)
    _write(spark, tdir, trade_rows[6:], tschema)
    _write(spark, qdir, quote_rows[:4], qschema)
    _write(spark, qdir, quote_rows[4:], qschema)

    trades = _ts(
        spark.readStream.schema(tschema).option("maxFilesPerTrigger", 1).parquet(tdir),
        "ts",
    )
    quotes = _ts(
        spark.readStream.schema(qschema).option("maxFilesPerTrigger", 1).parquet(qdir),
        "qts",
    )
    q = (
        join_trades_quotes(trades, quotes, max_quote_age="60 seconds")
        .writeStream.format("memory")
        .queryName("tq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("tq").collect()}

    bt = _ts(spark.createDataFrame(trade_rows, tschema), "ts").alias("t")
    bq = _ts(spark.createDataFrame(quote_rows, qschema), "qts").alias("q")
    expect = {
        tuple(r)
        for r in bt.join(
            bq,
            (F.col("t.symbol") == F.col("q.symbol"))
            & (F.col("q.qts") <= F.col("t.ts"))
            & (F.col("q.qts") >= F.col("t.ts") - F.expr("INTERVAL 60 seconds")),
        )
        .select(
            F.col("t.symbol").alias("symbol"),
            F.unix_millis("t.ts").alias("trade_ms"),
            F.unix_millis("q.qts").alias("quote_ms"),
            "t.price",
            "t.amount",
            "q.bid",
            "q.ask",
            (F.col("q.ask") - F.col("q.bid")).alias("spread"),
        )
        .collect()
    }
    assert got == expect and len(got) > 10


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "ticks")
    schema = "ts long, symbol string, price double, amount double"
    rows = [(T0 + i * SEC, "XRPUSD", 100.0 + i, 1.0) for i in range(10)]
    _write(spark, src, rows, schema)
    _write(spark, src, rows[5:] + [(T0 + 10 * SEC, "XRPUSD", 110.0, 1.0)], schema)

    ticks = _ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "ts",
    )
    q = (
        dedup_tick_stream(ticks)
        .select("symbol", F.unix_millis("ts").alias("ms"), "price")
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("dedup").collect()
    assert len(out) == 11  # 10 unique + 1 new; 5 re-delivered dropped
    assert len({(r["symbol"], r["ms"]) for r in out}) == 11


def _run_vwap(spark, tmp_path, op):
    src = str(tmp_path / "ticks")
    schema = "ts long, symbol string, price double, amount double"
    _write(spark, src, [(T0, "XRPUSD", 100.0, 2.0), (T0 + SEC, "XRPUSD", 110.0, 2.0)], schema)
    _write(spark, src, [(T0 + 2 * SEC, "XRPUSD", 130.0, 4.0)], schema)
    ticks = _ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "ts",
    )
    batches: list = []
    q = (
        op(ticks)
        .writeStream.foreachBatch(lambda df, bid: batches.append((bid, df.collect())))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return [r for _, rs in batches for r in rs]


def _assert_vwap(rows):
    assert len(rows) == 2  # one updated VWAP per micro-batch
    # batch 1: vol 4, notional 420 -> 105; batch 2 adds vol 4, notional 520
    assert rows[0]["vwap"] == 105.0
    final = rows[-1]
    assert final["cum_volume"] == 8.0
    assert final["cum_notional"] == 940.0
    assert final["vwap"] == 117.5


def test_running_vwap_state_spans_batches(spark, tmp_path):
    _assert_vwap(_run_vwap(spark, tmp_path, running_vwap_legacy))


@pytest.mark.skipif(
    not TRANSFORM_WITH_STATE_AVAILABLE,
    reason="transformWithStateInPandas needs google.protobuf (not in container)",
)
def test_running_vwap_transform_with_state(spark, tmp_path):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _assert_vwap(_run_vwap(spark, tmp_path, running_vwap))
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_sink_maintains_rollups(spark, tmp_path):
    """End-to-end: tick stream -> 5m candles -> partitioned dataset,
    with the 1h continuous aggregate refreshed per micro-batch; stored
    rollup equals a batch resample of the stored 5m candles restricted
    to closed hours."""
    from ccxt_ohlcv_fetcher_spark.operators.ingest import CandleDataset
    from ccxt_ohlcv_fetcher_spark.operators.resample import resample_candles
    from ccxt_ohlcv_fetcher_spark.operators.rollup import MaterializedRollups
    from ccxt_ohlcv_fetcher_spark.streaming.candles import (
        read_tick_stream,
        start_candle_sink,
        streaming_ohlcv,
    )

    # 2h30m of 1-minute ticks, landed as two files (two micro-batches)
    tick_rows = [
        (float((T0 + i * 60 * SEC) / 1000.0), "bitfinex", "XRPUSD", 100.0 + (i % 9), 2.0)
        for i in range(150)
    ]
    tick_dir = str(tmp_path / "ticks")
    for chunk in (tick_rows[:90], tick_rows[90:]):
        spark.createDataFrame(
            chunk, "ts double, exchange string, symbol string, price double, amount double"
        ).withColumn("ts", F.expr("timestamp_seconds(ts)")).coalesce(1).write.mode(
            "append"
        ).parquet(tick_dir)

    ds = CandleDataset(spark, str(tmp_path / "candles"))
    rollups = MaterializedRollups(
        spark, ds, str(tmp_path / "rollups"), levels=("1h",), base_timeframe="5m"
    )
    q = start_candle_sink(
        streaming_ohlcv(read_tick_stream(spark, tick_dir), "5m"),
        ds,
        "5m",
        str(tmp_path / "ckpt"),
        rollups=rollups,
    )
    q.awaitTermination(180)

    stored_1h = rollups.read("1h")
    # 2 closed hours (the 30-min tail hour stays unmaterialized)
    assert stored_1h.count() == 2
    expect = resample_candles(ds.read(timeframe="5m"), "1h").filter(
        F.col("timestamp") < T0 + 2 * 3600 * SEC
    )
    got = {
        (r["timestamp"], r["open"], r["high"], r["low"], r["close"], r["volume"])
        for r in stored_1h.collect()
    }
    want = {
        (r["timestamp"], r["open"], r["high"], r["low"], r["close"], r["volume"])
        for r in expect.collect()
    }
    assert got == want
