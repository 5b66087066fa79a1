"""Hierarchical candle rollup (operators/resample.py:resample_candles):
the OHLC composition law makes rollups associative — chaining through an
intermediate timeframe must equal the direct rollup exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccxt_ohlcv_fetcher_spark.operators.ingest import project_ohlcv_rows
from ccxt_ohlcv_fetcher_spark.operators.resample import resample_candles

T0 = 1700000400000 - (1700000400000 % 3600000)  # hour-aligned


def _candles(spark, n=180):
    # 1m candles with non-monotonic prices so open/close picks matter
    rows = [
        [
            T0 + i * 60_000,
            100.0 + ((i * 7) % 13),
            105.0 + ((i * 5) % 11),
            95.0 - ((i * 3) % 7),
            100.0 + ((i * 11) % 9),
            1.0 + (i % 4),
        ]
        for i in range(n)
    ]
    return project_ohlcv_rows(spark, rows, "bitfinex", "XRP/USD", "1m")


def _key(r):
    return (r["exchange"], r["symbol"], r["timestamp"])


def test_rollup_chain_equals_direct(spark):
    c1m = _candles(spark)
    direct = resample_candles(c1m, "1h").collect()
    chained = resample_candles(
        resample_candles(c1m, "5m"), "1h"
    ).collect()
    assert len(direct) == 3
    d = {_key(r): r for r in direct}
    c = {_key(r): r for r in chained}
    assert d.keys() == c.keys()
    for k in d:
        for col in ("open", "high", "low", "close", "volume"):
            assert d[k][col] == c[k][col], (k, col)


def test_rollup_bucket_values(spark):
    c1m = _candles(spark, n=60)
    row = resample_candles(c1m, "1h").collect()[0]
    raw = {r["timestamp"]: r for r in c1m.collect()}
    assert row["timestamp"] == T0
    assert row["open"] == raw[T0]["open"]
    assert row["close"] == raw[T0 + 59 * 60_000]["close"]
    assert row["high"] == max(r["high"] for r in raw.values())
    assert row["low"] == min(r["low"] for r in raw.values())
    assert row["volume"] == sum(r["volume"] for r in raw.values())


def test_week_buckets_share_monday_anchor(spark):
    """ADVICE r1: '1w' (date_trunc, Monday) and 'Nw' (window) must sit on
    one grid — window() is epoch-anchored (Thursday) unless offset."""
    from pyspark.sql import functions as F

    from ccxt_ohlcv_fetcher_spark.operators.resample import bucket_start

    ts0 = 1700000000000  # 2023-11-14, a Tuesday
    df = spark.range(12).select(
        F.timestamp_millis(
            F.lit(ts0) + F.col("id") * F.lit(86_400_000 * 5)
        ).alias("ts")
    )
    # one window() expression per projection (Spark rejects multiple)
    w1 = [r["w"] for r in df.select(bucket_start("ts", "1w").alias("w")).collect()]
    w2 = [r["w"] for r in df.select(bucket_start("ts", "2w").alias("w")).collect()]
    w3 = [r["w"] for r in df.select(bucket_start("ts", "3w").alias("w")).collect()]
    week_ms = 7 * 86_400_000
    for b1, b2, b3 in zip(w1, w2, w3):
        for b in (b1, b2, b3):
            assert b.isoweekday() == 1, b  # Monday-anchored, every width
        # each 1w bucket nests inside its 2w/3w bucket on the same grid
        assert ((b1 - b2).total_seconds() * 1000) in (0, week_ms)
        assert ((b1 - b3).total_seconds() * 1000) in (0, week_ms, 2 * week_ms)


def test_keyed_indicators_independent_series(spark):
    """candle_indicator_frame with keys: each symbol's indicator series
    must equal the series computed on that symbol alone (windows never
    leak across keys), and frames/peaks behave per key."""
    from ccxt_ohlcv_fetcher_spark.operators.indicators import candle_indicator_frame

    rows = []
    for sym, base in (("AAA", 100.0), ("BBB", 50.0)):
        for i in range(12):
            rows.append((sym, i, base + (i % 5) - (2 if sym == "BBB" else 0)))
    df = spark.createDataFrame(rows, "symbol string, t long, close double")

    keyed = candle_indicator_frame(
        df, keys=("symbol",), close_col="close", order_col="t"
    ).collect()
    for sym in ("AAA", "BBB"):
        solo = candle_indicator_frame(
            df.filter(F.col("symbol") == sym),
            keys=(),
            close_col="close",
            order_col="t",
        ).collect()
        solo_by_t = {r["t"]: r for r in solo}
        for r in (x for x in keyed if x["symbol"] == sym):
            s = solo_by_t[r["t"]]
            assert (r["sma"], r["boll_hw"], r["rsi"], r["drawdown"]) == (
                s["sma"], s["boll_hw"], s["rsi"], s["drawdown"]
            ), f"window leaked across keys at {sym} t={r['t']}"


def test_holt_fold_matches_python_recurrence(spark):
    from ccxt_ohlcv_fetcher_spark.operators.indicators import holt_fold

    candles = _candles(spark, n=60)
    out = (
        holt_fold(
            candles,
            keys=("exchange", "symbol"),
            close_col="close",
            order_col="timestamp",
        )
        .orderBy("timestamp")
        .collect()
    )
    closes = [r["close"] for r in out]
    a, g = 0.25, 0.125
    lvl, trd = closes[0], 0.0
    expect = [(lvl, trd)]
    for x in closes[1:]:
        new_lvl = a * x + (1 - a) * (lvl + trd)
        trd = g * (new_lvl - lvl) + (1 - g) * trd
        lvl = new_lvl
        expect.append((lvl, trd))
    for row, (el, et) in zip(out, expect):
        # same association order -> bit-identical doubles
        assert row["level"] == el and row["trend"] == et
        assert row["forecast"] == el + et
