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


def test_stream_stream_left_outer_join(spark, tmp_path):
    """Unmatched trades must surface null-extended once the watermark
    proves no quote can still arrive; matched trades behave as inner."""
    from ccxt_ohlcv_fetcher_spark.streaming.joins import join_trades_quotes_outer

    # XRPUSD trades have quotes; BTCUSD trades never do. A far-future
    # flush row on BOTH sides advances the watermark (it is the min of
    # the two sides) far enough to emit the unmatched rows null-extended.
    trade_rows = [(T0 + i * 10 * SEC, "XRPUSD", 100.0 + i, 2.0) for i in range(6)] + [
        (T0 + 40 * SEC, "BTCUSD", 40_000.0, 0.1),
        (T0 + 50 * SEC, "BTCUSD", 40_100.0, 0.2),
    ]
    quote_rows = [(T0 + i * 15 * SEC, "XRPUSD", 99.0 + i, 101.0 + i) for i in range(4)]
    flush_t = [(T0 + 3600 * SEC, "FLUSH", 0.0, 0.0)]
    flush_q = [(T0 + 3600 * SEC, "FLUSH", 0.0, 0.0)]
    tdir, qdir = str(tmp_path / "trades"), str(tmp_path / "quotes")
    tschema = "ts long, symbol string, price double, amount double"
    qschema = "qts long, symbol string, bid double, ask double"
    _write(spark, tdir, trade_rows, tschema)
    _write(spark, tdir, flush_t, tschema)
    _write(spark, qdir, quote_rows, qschema)
    _write(spark, qdir, flush_q, qschema)

    trades = _ts(
        spark.readStream.schema(tschema).option("maxFilesPerTrigger", 1).parquet(tdir),
        "ts",
    )
    quotes = _ts(
        spark.readStream.schema(qschema).option("maxFilesPerTrigger", 1).parquet(qdir),
        "qts",
    )
    q = (
        join_trades_quotes_outer(trades, quotes, max_quote_age="60 seconds")
        .writeStream.format("memory")
        .queryName("tq_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = [r for r in spark.table("tq_outer").collect() if r["symbol"] != "FLUSH"]

    matched = [r for r in out if r["quote_ms"] is not None]
    unmatched = [r for r in out if r["quote_ms"] is None]
    # every BTCUSD trade is unmatched and null-extended
    assert {(r["symbol"], r["trade_ms"]) for r in unmatched} >= {
        ("BTCUSD", T0 + 40 * SEC),
        ("BTCUSD", T0 + 50 * SEC),
    }
    assert all(r["bid"] is None and r["ask"] is None and r["spread"] is None for r in unmatched)
    # matched side agrees with the batch inner join
    bt = _ts(spark.createDataFrame(trade_rows, tschema), "ts").alias("t")
    bq = _ts(spark.createDataFrame(quote_rows, qschema), "qts").alias("q")
    expect_inner = {
        (r["symbol"], r["trade_ms"], r["quote_ms"])
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
        )
        .collect()
    }
    assert {(r["symbol"], r["trade_ms"], r["quote_ms"]) for r in matched} == expect_inner


def test_sessionize_events_gap_and_timeout_close(spark, tmp_path):
    """Sessions close two ways: a later event past the gap (in-data) and
    watermark passing end+gap (silence). Both must emit exactly once,
    and extents must match the native session_window batch aggregation."""
    from ccxt_ohlcv_fetcher_spark.streaming.sessions import sessionize_events

    MIN = 60 * SEC
    rows = (
        # user 1: two sessions split by a 10-minute gap
        [(T0 + i * MIN, 1) for i in range(3)]
        + [(T0 + 13 * MIN, 1), (T0 + 14 * MIN, 1)]
        # user 2: one session, then silence forever
        + [(T0 + 2 * MIN, 2), (T0 + 3 * MIN, 2)]
    )
    flush = [(T0 + 3600 * SEC, 99)]  # drives the watermark past all timers
    src = str(tmp_path / "events")
    schema = "ts long, user_id long"
    _write(spark, src, rows, schema)
    _write(spark, src, flush, schema)

    events = _ts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "ts",
    )
    q = (
        sessionize_events(events, gap="5 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions").collect()
        if r["user_id"] != 99
    }
    expect = {
        (1, T0, T0 + 2 * MIN, 3),  # closed by the 10-min gap
        (1, T0 + 13 * MIN, T0 + 14 * MIN, 2),  # closed by timeout
        (2, T0 + 2 * MIN, T0 + 3 * MIN, 2),  # closed by timeout
    }
    assert got == expect

    # parity: extents equal the native session_window over the same data
    batch = _ts(spark.createDataFrame(rows, schema), "ts")
    native = {
        (r["user_id"], r["s"], r["e"], r["n"])
        for r in batch.groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_millis("session_window.start").alias("s"),
            (F.unix_millis("session_window.end") - 5 * 60 * 1000).alias("e"),
            "n",
        )
        .collect()
    }
    # session_window.end = last_event + gap; subtracting the gap aligns
    # both representations on last-event time
    assert native == expect


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join (E28s family): each micro-batch joins against
    the CURRENT state of a static dim — the standard streaming
    enrichment shape (ticks x instrument metadata). The static side is
    re-resolved per batch, so dim updates between batches are visible
    without restarting the query; the dim is broadcast, the stream
    never shuffles."""
    tick_dir, dim_dir = str(tmp_path / "ticks"), str(tmp_path / "dim")
    tschema = "ts long, symbol string, price double, amount double"
    _write(spark, tick_dir, [(T0 + i * SEC, "XRPUSD", 100.0 + i, 1.0) for i in range(5)], tschema)
    spark.createDataFrame(
        [("XRPUSD", "ripple", 4)], "symbol string, asset string, scale int"
    ).write.mode("overwrite").parquet(dim_dir)

    out_dir = str(tmp_path / "out")

    def run():
        # the static side resolves its file listing when the DataFrame is
        # built — a restarted query re-resolves, which is exactly how dim
        # updates become visible (same as REFRESH TABLE on a catalog dim)
        ticks = _ts(
            spark.readStream.schema(tschema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tick_dir),
            "ts",
        )
        dim = spark.read.parquet(dim_dir)
        enriched = ticks.join(F.broadcast(dim), "symbol", "left").select(
            "symbol", F.unix_millis("ts").alias("ms"), "price", "asset", "scale"
        )
        q = (
            enriched.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    out1 = spark.read.parquet(out_dir).collect()
    assert len(out1) == 5 and all(r["asset"] == "ripple" for r in out1)

    # dim update between runs: new rows see the NEW metadata
    spark.createDataFrame(
        [("XRPUSD", "ripple-v2", 6)], "symbol string, asset string, scale int"
    ).write.mode("overwrite").parquet(dim_dir)
    _write(spark, tick_dir, [(T0 + 100 * SEC, "XRPUSD", 200.0, 1.0)], tschema)
    run()
    out2 = {r["ms"]: r for r in spark.read.parquet(out_dir).collect()}
    assert out2[T0 + 100 * SEC]["asset"] == "ripple-v2"
    assert out2[T0]["asset"] == "ripple"  # earlier batch kept its join-time view


def test_sessionize_gap_accepts_spark_interval_spellings():
    """ADVICE r1: every fixed-duration Spark interval spelling parses;
    bad input raises ValueError (not KeyError) naming accepted forms."""
    from ccxt_ohlcv_fetcher_spark.streaming.sessions import _interval_ms

    assert _interval_ms("30 mins") == 1_800_000
    assert _interval_ms("30 minutes") == 1_800_000
    assert _interval_ms("2 days") == 172_800_000
    assert _interval_ms("90 seconds") == 90_000
    assert _interval_ms("1 week") == 604_800_000
    assert _interval_ms("250 ms") == 250
    with pytest.raises(ValueError, match="expected"):
        _interval_ms("5 parsecs")
    with pytest.raises(ValueError, match="expected"):
        _interval_ms("soon")


def test_stream_stream_full_outer_join(spark, tmp_path):
    """FULL OUTER: unmatched trades AND unmatched quotes both surface
    null-extended after the watermark closes their windows; matched
    rows agree with the inner join."""
    from ccxt_ohlcv_fetcher_spark.streaming.joins import (
        join_trades_quotes_full_outer,
    )

    # XRPUSD matches; BTCUSD trades have no quotes; ETHUSD quotes have
    # no trades (the stale-feed case only FULL outer can show).
    trade_rows = [(T0 + i * 10 * SEC, "XRPUSD", 100.0 + i, 2.0) for i in range(4)] + [
        (T0 + 40 * SEC, "BTCUSD", 40_000.0, 0.1),
    ]
    quote_rows = [(T0 + i * 15 * SEC, "XRPUSD", 99.0 + i, 101.0 + i) for i in range(3)] + [
        (T0 + 20 * SEC, "ETHUSD", 2_000.0, 2_001.0),
    ]
    flush_t = [(T0 + 3600 * SEC, "FLUSH", 0.0, 0.0)]
    flush_q = [(T0 + 3600 * SEC, "FLUSH", 0.0, 0.0)]
    tdir, qdir = str(tmp_path / "trades"), str(tmp_path / "quotes")
    tschema = "ts long, symbol string, price double, amount double"
    qschema = "qts long, symbol string, bid double, ask double"
    _write(spark, tdir, trade_rows, tschema)
    _write(spark, tdir, flush_t, tschema)
    _write(spark, qdir, quote_rows, qschema)
    _write(spark, qdir, flush_q, qschema)

    trades = _ts(
        spark.readStream.schema(tschema).option("maxFilesPerTrigger", 1).parquet(tdir),
        "ts",
    )
    quotes = _ts(
        spark.readStream.schema(qschema).option("maxFilesPerTrigger", 1).parquet(qdir),
        "qts",
    )
    q = (
        join_trades_quotes_full_outer(trades, quotes, max_quote_age="60 seconds")
        .writeStream.format("memory")
        .queryName("tq_full_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = [r for r in spark.table("tq_full_outer").collect() if r["symbol"] != "FLUSH"]

    # trade-side unmatched: BTCUSD trade, null quote columns
    btc = [r for r in out if r["symbol"] == "BTCUSD"]
    assert btc and all(
        r["quote_ms"] is None and r["bid"] is None and r["price"] is not None
        for r in btc
    )
    # quote-side unmatched: ETHUSD quote emitted with null trade columns
    eth = [r for r in out if r["symbol"] == "ETHUSD"]
    assert eth and all(
        r["trade_ms"] is None and r["price"] is None and r["bid"] is not None
        for r in eth
    )
    # matched side == batch inner join
    bt = _ts(spark.createDataFrame(trade_rows, tschema), "ts").alias("t")
    bq = _ts(spark.createDataFrame(quote_rows, qschema), "qts").alias("q")
    expect_inner = {
        (r["symbol"], r["trade_ms"], r["quote_ms"])
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
        )
        .collect()
    }
    got_matched = {
        (r["symbol"], r["trade_ms"], r["quote_ms"])
        for r in out
        if r["trade_ms"] is not None and r["quote_ms"] is not None
    }
    assert got_matched == expect_inner
